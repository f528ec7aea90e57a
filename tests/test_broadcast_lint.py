"""Source lint: every ``F.broadcast`` must be provably bounded.

The trap (VERDICT r6 "What's wrong" items 1-2): a forced broadcast of a
corpus-proportional side — the token document-frequency table in
``prefix_filter_jaccard_join`` (vocabulary-sized, grows per Heaps' law)
and the per-document ``sizes`` table (one row per doc) — is trivial at
sf0.1 but becomes a multi-GB driver-side collect-and-ship at 100 TB,
the exact driver-bottleneck class the design bar bans. The hints were
dropped in r7 (AQE still broadcasts small sides at runtime; a shuffle
join is correct otherwise). This lint keeps the class from recurring
among the ~200 remaining hint sites.

House rule enforced here: an ``F.broadcast(x)`` site passes only if
one of the following holds —

1. **provably bounded by shape** (AST dataflow within the enclosing
   function over simple ``name = expr`` assignments):
   - the argument chain (or the defining chain of the broadcast
     variable, followed transitively) contains ``.limit(n)``, or
   - it contains a GLOBAL ``.agg(...)`` / ``.count()`` — an ``agg``
     whose receiver chain has no ``groupBy`` / ``cube`` / ``rollup``
     (a global aggregate is exactly one row; a grouped aggregate has
     one row per key and keys can scale with the data), or
   - it is (derived from) a fixed-cardinality catalog dimension:
     ``region`` (5 rows) or ``nation`` (25 rows) per the TPC-H spec —
     matched by a ``load_tables(...)["region"|"nation"]`` subscript
     or a plain variable named ``region`` / ``nation`` / ``reg`` /
     ``nat`` (these names are reserved for those tables in this
     repo's query modules);
2. **argued in place**: a ``broadcast-ok: <why bounded>`` comment on
   the same line or one of the two preceding lines. The reason must
   say why the side's row count does NOT grow with the corpus
   (a literal/config-sized table, a k-row top-k, a frozen reference
   model, a per-round centroid set, ...).

Grouped aggregates over bounded key domains (status codes, languages,
calendar buckets, sketch registers) are common and fine — but the
bound lives in the data model, not the plan shape, so those sites
carry the comment rather than an auto-pass.
"""

from __future__ import annotations

import ast
from pathlib import Path

PACKAGE = Path(__file__).resolve().parent.parent / "concurrent_etl_spark"

_GROUPERS = {"groupBy", "groupby", "cube", "rollup"}
_DIM_NAMES = {"region", "nation", "reg", "nat"}
_DIM_TABLES = {"region", "nation"}


def _is_broadcast_call(node: ast.Call) -> bool:
    f = node.func
    if isinstance(f, ast.Attribute):
        return f.attr == "broadcast"
    if isinstance(f, ast.Name):
        return f.id == "broadcast"
    return False


def _chain_attrs(expr: ast.AST) -> list[str]:
    """Method/attribute names along a call chain, innermost first."""
    out: list[str] = []
    node = expr
    while True:
        if isinstance(node, ast.Call):
            node = node.func
        elif isinstance(node, ast.Attribute):
            out.append(node.attr)
            node = node.value
        else:
            break
    out.reverse()
    return out


def _chain_root(expr: ast.AST) -> ast.AST:
    node = expr
    while True:
        if isinstance(node, ast.Call):
            if _is_dim_load(node):
                return node
            node = node.func
        elif isinstance(node, ast.Attribute):
            node = node.value
        else:
            return node


def _is_dim_load(call: ast.Call) -> bool:
    """Calls that bound the side by construction.

    - ``load_table(spark, sf_dir, "region"|"nation")``: fixed
      TPC-H cardinality (5 / 25 rows);
    - ``spark.range(...)`` / ``spark.createDataFrame(...)``: the
      data is driver-local literals already, so shipping it to
      executors via broadcast is strictly correct (a huge literal
      frame would be a driver problem upstream of any join hint).
    """
    f = call.func
    fname = f.attr if isinstance(f, ast.Attribute) else (
        f.id if isinstance(f, ast.Name) else None
    )
    if fname in {"range", "createDataFrame"}:
        return True
    return fname == "load_table" and any(
        isinstance(a, ast.Constant) and a.value in _DIM_TABLES
        for a in call.args
    )


def _bounded_by_shape(
    expr: ast.AST, defs: dict[str, ast.AST], seen: frozenset[str] = frozenset()
) -> bool:
    """True if the expression chain provably bounds cardinality."""
    attrs = _chain_attrs(expr)
    if "limit" in attrs:
        return True
    if "agg" in attrs or "count" in attrs:
        # global agg/count: nothing grouping BEFORE the (first) agg.
        stop = min(
            attrs.index(a) for a in ("agg", "count") if a in attrs
        )
        if not any(a in _GROUPERS for a in attrs[:stop]):
            return True
    root = _chain_root(expr)
    if isinstance(root, ast.Call) and _is_dim_load(root):
        return True
    # tables["region"] / tables["nation"] subscript roots
    if isinstance(root, ast.Subscript):
        sl = root.slice
        if (
            isinstance(sl, ast.Constant)
            and isinstance(sl.value, str)
            and sl.value in _DIM_TABLES
        ):
            return True
    if isinstance(root, ast.Name):
        if root.id in _DIM_NAMES:
            return True
        if root.id not in seen and root.id in defs:
            return _bounded_by_shape(
                defs[root.id], defs, seen | {root.id}
            )
    return False


def _violations(source: str, filename: str = "<mem>") -> list[str]:
    tree = ast.parse(source, filename=filename)
    lines = source.splitlines()
    out: list[str] = []

    class _Visitor(ast.NodeVisitor):
        def __init__(self) -> None:
            self.scopes: list[dict[str, ast.AST]] = [{}]

        def _visit_func(self, node) -> None:
            self.scopes.append({})
            self.generic_visit(node)
            self.scopes.pop()

        visit_FunctionDef = _visit_func
        visit_AsyncFunctionDef = _visit_func

        def visit_Assign(self, node: ast.Assign) -> None:
            for t in node.targets:
                if isinstance(t, ast.Name):
                    self.scopes[-1][t.id] = node.value
            self.generic_visit(node)

        def visit_Call(self, node: ast.Call) -> None:
            if _is_broadcast_call(node) and node.args:
                ln = node.lineno
                window = lines[max(0, ln - 3) : ln]
                if not any("broadcast-ok" in l for l in window):
                    defs: dict[str, ast.AST] = {}
                    for scope in self.scopes:
                        defs.update(scope)
                    if not _bounded_by_shape(node.args[0], defs):
                        out.append(
                            f"{filename}:{ln}: F.broadcast on a side "
                            "not provably bounded (no limit/global-agg"
                            "/fixed dim in its chain) — drop the hint "
                            "(AQE broadcasts small sides) or justify "
                            "with a 'broadcast-ok: <why bounded>' "
                            "comment"
                        )
            self.generic_visit(node)

    _Visitor().visit(tree)
    return out


def test_lint_flags_unbounded_broadcast():
    bad = (
        "def q(spark, sf_dir):\n"
        "    df = tok.groupBy('t').agg(F.count('*').alias('df'))\n"
        "    return tok.join(F.broadcast(df), 't')\n"
    )
    v = _violations(bad)
    assert len(v) == 1, v


def test_lint_accepts_bounded_shapes():
    good = (
        "def q(spark, sf_dir):\n"
        "    tables = load_tables(spark, sf_dir)\n"
        "    nat = tables['nation']\n"
        "    tot = df.agg(F.sum('x').alias('tot'))\n"
        "    top = df.orderBy(F.desc('x')).limit(10)\n"
        "    a = df.join(F.broadcast(tot))\n"
        "    b = df.join(F.broadcast(top), 'k')\n"
        "    c = df.join(F.broadcast(nat), 'n_nationkey')\n"
        "    d = df.join(F.broadcast(tables['region']), 'r_regionkey')\n"
        "    # broadcast-ok: 26 language codes, fixed vocabulary\n"
        "    e = df.join(F.broadcast(lang_stats), 'lang')\n"
        "    return a.union(b).union(c).union(d).union(e)\n"
    )
    assert _violations(good) == [], _violations(good)


def test_lint_grouped_agg_is_not_global():
    bad = (
        "def q(spark, sf_dir):\n"
        "    per_doc = df.groupBy('doc_id').agg(F.count('*').alias('c'))\n"
        "    return df.join(F.broadcast(per_doc), 'doc_id')\n"
    )
    assert len(_violations(bad)) == 1


def test_package_broadcasts_all_bounded_or_argued():
    all_v = []
    for path in sorted(PACKAGE.rglob("*.py")):
        all_v.extend(_violations(path.read_text(), str(path)))
    assert all_v == [], "\n".join(all_v)
