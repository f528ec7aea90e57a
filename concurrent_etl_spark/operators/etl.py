"""Composite ETL pipelines (SURVEY.md §2.6-2.8, §3 EP1/EP3).

The reference's two end-to-end jobs, re-shaped Spark-first onto the
canonical testdata star schema:

  * ``case1_pipeline``  — EP1/EP2: glob-read files, route by
    filename template, project+rename, cast measures, append-sink.
    The per-file loop / thread pool / process pool all collapse into
    one lazy plan (case_1/NormalETL.py:40-43 and friends).

  * ``flagship_confirmation`` — EP3's per-chunk transform
    (case_2/Normal.py:163-273): staging casts, then the 4-dim
    left-join chain attaching surrogate keys, then the final load
    projection. Re-shaped: lineitem is the fact feed; orders ->
    customer -> nation -> region is the dimension chain. Only the
    bounded dims (nation, region) carry broadcast hints; orders and
    customer GROW with the fact, so their joins are declared
    hint-free — AQE converts them to broadcast at small SF and keeps
    them as shuffle joins (bucketable, see sources/warehouse.py) at
    100 TB, where broadcasting a fact-scaled table would OOM every
    executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from concurrent_etl_spark.functions.strings import path_stem, template_token


def route_templates(df: DataFrame, file_col: str = "_source_file") -> DataFrame:
    """Filename-template routing (P4, case_1/NormalETL.py:13-24).

    Adds ``template`` = token after the last '_' of the file stem.
    Unknown templates are kept and tagged rather than aborting — a
    100 TB job dead-letters bad inputs instead of crashing the driver;
    callers filter ``template IN (...)`` and divert the rest.
    """
    stem = path_stem(F.col(file_col))
    return df.withColumn("template", template_token(stem))


def with_provenance(df: DataFrame) -> DataFrame:
    """Attach per-row source-file provenance (S1).

    The reference materialized a Python list of paths
    (case_1/NormalETL.py:8-9); in Spark the source handles listing
    and ``input_file_name()`` recovers provenance per row.
    """
    return df.withColumn("_source_file", F.input_file_name())


#: case-1 template registry: template tag -> (source cols, renamed cols,
#: int-cast cols). Mirrors the hardcoded lists at case_1/NormalETL.py:16-21.
CASE1_TEMPLATES: dict[str, dict[str, list[str]]] = {
    "OPERATIONS": {
        "source": ["order_id", "scrap_qty", "yield_qty", "total_qty"],
        "target": [
            "productionOrder",
            "confirmedActivityScrapQuantity",
            "confirmedYield",
            "totalOrderQuantity",
        ],
        "int_cols": [
            "confirmedActivityScrapQuantity",
            "confirmedYield",
            "totalOrderQuantity",
        ],
    },
    "CONFIRMATION": {
        "source": ["order_id", "op_qty", "yield_qty", "scrap_qty", "counter"],
        "target": [
            "productionOrder",
            "operationQuantity",
            "confirmYield",
            "confirmScrap",
            "confirmCounter",
        ],
        "int_cols": [
            "operationQuantity",
            "confirmYield",
            "confirmScrap",
            "confirmCounter",
        ],
    },
}


def case1_pipeline(
    staged: DataFrame,
    template: str,
    templates: dict[str, dict[str, list[str]]] | None = None,
    strict: bool = False,
) -> DataFrame:
    """EP1/EP2 transform as one lazy plan (case_1/NormalETL.py:12-32).

    Input: all-string staged rows (read_csv_staged / read_excel_dir)
    already routed (route_templates + filter). Steps: project the
    template's source columns (P1), positional rename to warehouse
    names (P2), int-cast the measures (F3). The per-file loop, thread
    pool, and semaphores of the reference are Spark's scheduler now.
    """
    from concurrent_etl_spark.functions.casts import staged_cast

    spec = (templates or CASE1_TEMPLATES)[template]
    projected = staged.select(*spec["source"]).toDF(*spec["target"])
    casts = {c: staged_cast(c, "int", strict=strict) for c in spec["int_cols"]}
    return projected.withColumns(casts)


def confirmation_etl(
    staged: DataFrame,
    dims: dict[str, DataFrame],
    dim_keys: dict[str, str],
    int_cols: list[str] | None = None,
    float_cols: list[str] | None = None,
    date_cols: list[str] | None = None,
    time_cols: list[str] | None = None,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """EP3's per-chunk transform as one batch-level operator
    (case_2/Normal.py:163-273, case_2/MultithreadETL.py:280-405).

    Steps: typed casts over the all-string staging (F3-F10), then per
    dimension: upsert new members (§2.6, ONCE per batch — not per
    chunk, fixing the reference's read-check-insert race), then
    broadcast left-join each dim's surrogate id onto the facts (J1).

    Returns (facts_with_surrogate_ids, updated_dims). Chunking
    (MAX_INSERT_ROW=1000) does not exist: partitions are the chunks.
    """
    from concurrent_etl_spark.functions.casts import to_typed
    from concurrent_etl_spark.operators.dims import upsert_dimension
    from concurrent_etl_spark.operators.relational import broadcast_left_join

    typed = to_typed(
        staged,
        int_cols=int_cols,
        float_cols=float_cols,
        date_cols=date_cols,
        time_cols=time_cols,
    )
    updated: dict[str, DataFrame] = {}
    out = typed
    for dim_name, key in dim_keys.items():
        dim = upsert_dimension(
            dims[dim_name], typed.select(key), key, id_col=f"{dim_name}ID"
        )
        updated[dim_name] = dim
        out = broadcast_left_join(out, dim, key)
    return out, updated


def flagship_confirmation(tables: dict[str, DataFrame]) -> DataFrame:
    """EP3 transform re-shaped onto testdata (the flagship query).

    lineitem (fact feed) --left join--> orders --> customer -->
    nation --> region, derive typed/measure columns, project the
    load list. Mirrors the 4x dim join of case_2/Normal.py:232-236
    and the final projection :266-273.

    Join-strategy contract (asserted in TestFlagshipPlan):
      * nation/region: broadcast hints — O(100) rows at any SF.
      * orders/customer: NO hint. They scale with the fact (1/4 and
        1/40 of lineitem rows), so the declared plan is a shuffle
        join; AQE's runtime size check converts both to broadcast at
        test SFs, while a 100 TB run keeps the shuffle (or avoids it
        entirely with bucketed layouts, sources/warehouse.py).
    """
    li = tables["lineitem"]
    orders = tables["orders"]
    customer = tables["customer"]
    nation = tables["nation"]
    region = tables["region"]

    # staging-style derivations (F3-F9 analogues on real columns)
    fact = li.withColumns(
        {
            "gross_revenue": F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ),
            "ship_year": F.year("l_shipdate"),
        }
    )

    # explicit key equalities (no shared column names across dims)
    joined = (
        fact.join(orders, fact["l_orderkey"] == orders["o_orderkey"], "left")
        .join(customer, orders["o_custkey"] == customer["c_custkey"], "left")
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "left")
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"], "left")
    )

    # final load projection (P3)
    return joined.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_quantity").alias("quantity"),
        F.col("gross_revenue"),
        F.col("ship_year"),
        F.col("l_returnflag").alias("returnflag"),
        F.col("o_orderstatus").alias("orderstatus"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
    )
