"""Excel source adapter (S2) — mapInPandas over binary files.

The reference's input format is SAP-exported .xlsx read per-file with
pd.read_excel (case_1/NormalETL.py:26; case_2/Normal.py:93). Spark
has no built-in Excel reader; the production options are the
spark-excel package or this adapter: binaryFile source -> Arrow
batches -> per-file decode inside executors. Listing, scheduling,
and retries stay Spark's job; only the byte decode runs in Python.

Decode strategy: ``pd.read_excel`` (openpyxl) when the codec is
installed, else the vendored minimal SpreadsheetML decoder below —
xlsx is a documented public format (ECMA-376: a zip archive holding
``xl/workbook.xml``, ``xl/worksheets/sheetN.xml``, and an optional
``xl/sharedStrings.xml``), and the staging model only needs cell
values as strings (dtype=str, case_2/Normal.py:93), so a stdlib
zipfile+ElementTree parse covers the reference's entire input
surface without a dependency.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

_SSML = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RELNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_ODREL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _excel_codec_available() -> bool:
    try:  # pragma: no cover - depends on environment
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


def _col_index(ref: str) -> int:
    """0-based column index from an A1-style cell ref ('BC12' -> 54)."""
    idx = 0
    for ch in ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return idx - 1


def _first_sheet_path(zf: zipfile.ZipFile) -> str:
    """Resolve the workbook's first sheet via its relationship id;
    fall back to the lexically-first worksheet part."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        first = wb.find(f"{_SSML}sheets/{_SSML}sheet")
        rid = first.get(f"{_ODREL}id")
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rels.findall(f"{_RELNS}Relationship"):
            if rel.get("Id") == rid:
                target = rel.get("Target").lstrip("/")
                path = target if target.startswith("xl/") else "xl/" + target
                if path in zf.namelist():
                    return path
    except (KeyError, ET.ParseError, AttributeError):
        pass
    cands = sorted(
        n
        for n in zf.namelist()
        if n.startswith("xl/worksheets/") and n.endswith(".xml")
    )
    if not cands:
        raise ValueError("xlsx package contains no worksheet part")
    return cands[0]


def read_xlsx_bytes(data: bytes) -> pd.DataFrame:
    """Decode one .xlsx payload to an all-string DataFrame.

    Minimal ECMA-376 SpreadsheetML reader: first worksheet only,
    first row is the header (pd.read_excel default), every value
    returned as its raw cell string (dtype=str staging semantics).
    Handles shared strings (rich-text runs concatenated), inline
    strings, formula-cached strings, booleans, and numeric cells;
    sparse rows place cells by their A1 refs so gaps stay None.
    """
    zf = zipfile.ZipFile(io.BytesIO(data))
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{_SSML}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_SSML}t")))

    root = ET.fromstring(zf.read(_first_sheet_path(zf)))
    rows: list[dict[int, str | None]] = []
    for row_el in root.iter(f"{_SSML}row"):
        cells: dict[int, str | None] = {}
        auto = 0
        for c in row_el.findall(f"{_SSML}c"):
            ref = c.get("r")
            ci = _col_index(ref) if ref else auto
            auto = ci + 1
            t = c.get("t", "n")
            if t == "inlineStr":
                is_el = c.find(f"{_SSML}is")
                val = (
                    "".join(tt.text or "" for tt in is_el.iter(f"{_SSML}t"))
                    if is_el is not None
                    else None
                )
            else:
                v = c.find(f"{_SSML}v")
                if v is None or v.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v.text)]
                elif t == "b":
                    val = "True" if v.text.strip() == "1" else "False"
                else:  # "n" (number) or "str" (formula-cached string)
                    val = v.text
            cells[ci] = val
        rows.append(cells)

    if not rows:
        return pd.DataFrame()
    header_cells = rows[0]
    width = (max(header_cells) + 1) if header_cells else 0
    header = [
        header_cells.get(i)
        if header_cells.get(i) is not None
        else f"Unnamed: {i}"
        for i in range(width)
    ]
    body = [[r.get(i) for i in range(width)] for r in rows[1:]]
    return pd.DataFrame(body, columns=header, dtype=object)


def _decode_one(content: bytes) -> pd.DataFrame:
    if _excel_codec_available():  # pragma: no cover - env-dependent
        return pd.read_excel(io.BytesIO(content), dtype=str, na_values=None)
    return read_xlsx_bytes(content)


def read_excel_dir(
    spark: SparkSession,
    path_glob: str,
    columns: list[str],
) -> DataFrame:
    """Read a directory of .xlsx into an all-string staged DataFrame.

    Output schema: ``columns`` (all string, dtype=str semantics) +
    ``_source_file`` provenance. One task per file (binaryFile
    source); memory per task bounded by the largest single file, the
    same constraint the reference had per-thread. Missing columns
    surface as nulls; extra sheet columns are dropped — the staging
    projection the reference did with df[expected_cols].
    """
    out_schema = StructType(
        [StructField(c, StringType()) for c in columns]
        + [StructField("_source_file", StringType())]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                data = _decode_one(row["content"])
                data = data[[c for c in columns if c in data.columns]]
                for c in columns:
                    if c not in data.columns:
                        data[c] = None
                data = data[columns].astype(object)
                data["_source_file"] = row["path"]
                yield data

    binary = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return binary.mapInPandas(decode, out_schema)


def write_xlsx_minimal(
    path: str, header: list[str], rows: list[list[object]]
) -> None:
    """Write a minimal valid ECMA-376 xlsx (one worksheet, shared
    strings for text, numeric cells for numbers). Synthesis-side
    counterpart of the reader — used to manufacture genuine .xlsx
    inputs for driver-visible round trips; correctness of the pair
    is judged against the SOURCE data (the oracle reads the same
    rows from parquet), never against each other.
    """
    import zipfile
    from xml.sax.saxutils import escape

    def col_letter(i: int) -> str:
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(65 + r) + s
        return s

    shared: list[str] = []

    def cell(ref: str, v: object) -> str:
        if v is None:
            return ""
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        sv = str(v)
        if sv not in shared:
            shared.append(sv)
        return f'<c r="{ref}" t="s"><v>{shared.index(sv)}</v></c>'

    body = []
    for rn, row in enumerate([list(header)] + rows, start=1):
        cells = "".join(
            cell(f"{col_letter(ci)}{rn}", v) for ci, v in enumerate(row)
        )
        body.append(f'<row r="{rn}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        f'2006/main" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(
            f'<si><t xml:space="preserve">{escape(s)}</t></si>'
            for s in shared
        )
        + "</sst>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'sharedStrings+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", sst)
