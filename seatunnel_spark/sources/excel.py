"""Excel (.xlsx) connector — pure stdlib, no POI/openpyxl.

Reference: connector-file-base ExcelWriteStrategy.java / the excel read
strategy (Apache POI). An ``.xlsx`` is a ZIP of XML parts (ECMA-376 / ISO
29500, public spec), so a minimal SpreadsheetML subset needs nothing beyond
``zipfile`` + ``xml.etree``: one sheet, inline strings, numbers, booleans,
header row. That covers exactly what the reference's excel sink emits (a
header row + typed cells, one sheet per file).

Scale note: the xlsx format itself caps a sheet at 1,048,576 rows — excel is
inherently a small-file format, so the sink writes ONE file per Spark
partition via ``foreachPartition`` (executor-side, parallel, like the
reference's per-writer files) and the source parses files driver-side into a
createDataFrame (bounded by the format, not by the engine).
"""

from __future__ import annotations

import os
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_ref(idx: int) -> str:
    """0-based column index → A1-style column letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(v))}</t></is></c>'


def write_xlsx(path: str, header: list[str], rows) -> int:
    """Write one sheet with a header row + data rows. Returns rows written."""
    body = []
    cells = "".join(_cell_xml(f"{_col_ref(c)}1", h) for c, h in enumerate(header))
    body.append(f'<row r="1">{cells}</row>')
    n = 0
    for i, row in enumerate(rows):
        r = i + 2
        if r > 1048576:
            raise ValueError("xlsx sheet limit (1,048,576 rows) exceeded")
        cells = "".join(_cell_xml(f"{_col_ref(c)}{r}", v) for c, v in enumerate(row))
        body.append(f'<row r="{r}">{cells}</row>')
        n += 1
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return n


_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def read_xlsx(path: str) -> tuple[list[str], list[list]]:
    """Parse sheet1 back to (header, rows). Handles inline strings, shared
    strings (other writers use them), numbers, booleans, gaps."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    grid: dict[int, dict[int, object]] = {}
    for row in sheet.iter(f"{_NS}row"):
        for c in row.findall(f"{_NS}c"):
            m = _REF_RE.match(c.get("r", ""))
            if not m:
                continue
            col = 0
            for ch in m.group(1):
                col = col * 26 + (ord(ch) - ord("A") + 1)
            col -= 1
            r = int(m.group(2)) - 1
            t = c.get("t", "n")
            if t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                val = "".join(x.text or "" for x in is_el.iter(f"{_NS}t")) if is_el is not None else None
            else:
                v_el = c.find(f"{_NS}v")
                raw = v_el.text if v_el is not None else None
                if raw is None:
                    val = None
                elif t == "s":
                    val = shared[int(raw)]
                elif t == "b":
                    val = raw == "1"
                elif t == "str":
                    val = raw
                else:
                    val = float(raw)  # xlsx numbers are IEEE doubles
            grid.setdefault(r, {})[col] = val
    if not grid:
        return [], []
    width = max(max(cols) for cols in grid.values()) + 1
    header = [grid.get(0, {}).get(c) for c in range(width)]
    rows = [
        [grid.get(r, {}).get(c) for c in range(width)]
        for r in sorted(grid) if r > 0
    ]
    return [str(h) for h in header], rows


# ------------------------------------------------------- Spark connectors
def write_excel_sink(df: DataFrame, path: str, save_mode: str = "error_if_exists") -> None:
    """One .xlsx per Spark partition (executor-side, parallel) — the
    reference's per-writer file layout. Save modes match the other file
    sinks (DataSaveMode.java): error_if_exists raises on existing output,
    overwrite clears it first, ignore returns, append adds uniquely-named
    files alongside the old ones."""
    import uuid

    existing = (
        [f for f in os.listdir(path) if f.endswith(".xlsx")]
        if os.path.isdir(path)
        else []
    )
    if existing:
        if save_mode == "error_if_exists":
            raise FileExistsError(f"excel output already exists at {path}")
        if save_mode == "ignore":
            return
        if save_mode == "overwrite":
            for f in existing:
                os.unlink(os.path.join(path, f))
    os.makedirs(path, exist_ok=True)
    header = list(df.columns)
    run_id = uuid.uuid4().hex[:8]  # append-safe unique file names

    def write_partition(idx_rows):
        idx, rows = idx_rows
        rows = list(rows)
        if rows:
            write_xlsx(
                os.path.join(path, f"part-{run_id}-{idx:05d}.xlsx"), header, rows
            )

    df.rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, [list(r) for r in it])]
    ).foreach(lambda p: write_partition(p))


def read_excel_source(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a directory of .xlsx (or one file) into a DataFrame. Parsing is
    driver-side — the format caps itself at ~1M rows per sheet.

    ``schema``: xlsx carries no column types (every number is a double), so
    without one, integer columns are restored heuristically (a column whose
    values are all integral becomes long — data-dependent across batches).
    Pass a StructType for stable types; values are cast to it."""
    files = (
        [path]
        if path.endswith(".xlsx")
        else sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".xlsx")
        )
    )
    header: list[str] = []
    all_rows: list[list] = []
    for f in files:
        h, rows = read_xlsx(f)
        if h:
            header = h
        all_rows.extend(rows)
    if not header:
        raise ValueError(f"no .xlsx content under {path}")
    if schema is not None:
        idx = {h: i for i, h in enumerate(header)}

        def conv(v, dt):
            if v is None:
                return None
            t = dt.simpleString()
            if t in ("tinyint", "smallint", "int", "bigint"):
                return int(float(v))
            if t in ("float", "double"):
                return float(v)
            if t == "boolean":
                return v if isinstance(v, bool) else str(v).lower() in ("true", "1")
            return str(v)

        rows = [
            [conv(r[idx[f.name]], f.dataType) if f.name in idx else None
             for f in schema.fields]
            for r in all_rows
        ]
        return spark.createDataFrame(rows, schema)
    # no schema: xlsx stores every number as an IEEE double; restore integer
    # columns per COLUMN (all values integral → long). Data-dependent — pass
    # a schema for stable types across batches.
    for c in range(len(header)):
        vals = [r[c] for r in all_rows if r[c] is not None]
        if vals and all(isinstance(v, float) and v.is_integer() for v in vals):
            for r in all_rows:
                if r[c] is not None:
                    r[c] = int(r[c])
    return spark.createDataFrame(all_rows, header)
