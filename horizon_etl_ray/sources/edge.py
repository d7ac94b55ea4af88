"""Messy-source edge readers: xlsx workbooks and HTML tables → Arrow.

Closes the reference's last native source formats (SURVEY §2.2 /
VERDICT r3 "missing #4"): manual Excel inputs loaded with ``pd.read_excel``
(/root/reference/src/core/logic/project_loader.py:86) and scraped HTML
pages whose tables BeautifulSoup extracts
(/root/reference/src/core/logic/loaders.py:18-80). This container has
neither openpyxl nor bs4, and neither is needed: an ``.xlsx`` is a zip of
XML sheets (ECMA-376, parseable with ``zipfile`` + ``xml.etree``), and
HTML tables fall to the stdlib ``html.parser``.

Scale shape: these are EDGE inputs — human-maintained workbooks and
crawled pages measured in megabytes, not the 100-TB fact path. Workbooks
parse driver-side (or one Ray task per file via ``read_xlsx_dataset``);
HTML parsing ships as :class:`HtmlTableStage`, an actor-pool
``map_batches`` stage that explodes a column of fetched page bodies into
table-cell rows — the deserialize step behind the FetchStage transport
pattern (stages/fetch.py), so crawled pages stream through the cluster
like any other batch."""

from __future__ import annotations

import math
import re
import zipfile
from html.parser import HTMLParser
from xml.etree import ElementTree as ET

import pyarrow as pa

__all__ = [
    "read_xlsx_table",
    "read_xlsx_dataset",
    "parse_html_tables",
    "HtmlTableStage",
]

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_COL_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' → 0, 'Z' → 25, 'AA' → 26 (cell reference column part)."""
    v = 0
    for ch in ref:
        v = v * 26 + (ord(ch) - 64)
    return v - 1


def _load_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def read_xlsx_table(path: str, sheet: int = 0,
                    header: bool = True) -> pa.Table:
    """Parse one worksheet of an ``.xlsx`` into an Arrow table.

    First row becomes the column names when ``header`` (the
    ``pd.read_excel`` default the reference relies on); missing cells are
    null. Columns whose every value parses as a number come out float64
    (int64 if all integral), else string — the same permissive coercion a
    manual workbook needs."""
    with zipfile.ZipFile(path) as zf:
        shared = _load_shared_strings(zf)
        # numeric sort: lexicographic order puts sheet10 before sheet2, so
        # the `sheet` index would select the wrong worksheet on 10+ sheets
        sheets = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"sheet(\d+)\.xml", n).group(1)))
        if not sheets:
            raise ValueError(f"no worksheets in {path}")
        root = ET.fromstring(zf.read(sheets[sheet]))
    rows: list[dict[int, str]] = []
    max_col = -1
    for row_el in root.iter(f"{_NS}row"):
        row: dict[int, str] = {}
        for c in row_el.findall(f"{_NS}c"):
            ref = c.get("r", "")
            m = _COL_RE.fullmatch(ref)
            ci = _col_index(m.group(1)) if m else len(row)
            typ = c.get("t", "n")
            if typ == "inlineStr":
                val = "".join(t.text or "" for t in c.iter(f"{_NS}t"))
            else:
                v_el = c.find(f"{_NS}v")
                if v_el is None or v_el.text is None:
                    continue
                val = (shared[int(v_el.text)] if typ == "s" else v_el.text)
            row[ci] = val
            max_col = max(max_col, ci)
        rows.append(row)
    if not rows:
        return pa.table({})
    n_cols = max_col + 1
    if header:
        head, body = rows[0], rows[1:]
        names = []
        for i in range(n_cols):
            nm = str(head.get(i, f"col{i}"))
            while nm in names:  # duplicate header cells: a dict would
                nm += "_"       # silently drop all but the last column
            names.append(nm)
    else:
        body = rows
        names = [f"col{i}" for i in range(n_cols)]
    cols: list[pa.Array] = []
    for i in range(n_cols):
        vals = [r.get(i) for r in body]
        nums = []
        numeric = True
        for v in vals:
            if v is None:
                nums.append(None)
                continue
            try:
                f = float(v)
            except (ValueError, OverflowError):
                numeric = False
                break
            if not math.isfinite(f):
                # 'NaN'/'Infinity'/'1e999' parse as float but would crash
                # the integral check (int(nan) raises) — messy manual cells
                # like these stay strings
                numeric = False
                break
            nums.append(f)
        if numeric and any(v is not None for v in vals):
            if all(n is None or n == int(n) for n in nums):
                cols.append(pa.array(
                    [None if n is None else int(n) for n in nums],
                    pa.int64()))
            else:
                cols.append(pa.array(nums, pa.float64()))
        else:
            cols.append(pa.array(vals, pa.string()))
    return pa.table(dict(zip(names, cols)))


def read_xlsx_dataset(paths: list[str], sheet: int = 0):
    """One Ray task per workbook → a Dataset (edge inputs are small manual
    files; the per-file task keeps parsing off the driver and the result
    streams like any other source)."""
    import ray
    import ray.data as rd

    @ray.remote(num_cpus=1)
    def parse(p: str) -> pa.Table:
        t = read_xlsx_table(p, sheet=sheet)
        return t.append_column("_source_file", pa.array([p] * len(t)))

    return rd.from_arrow_refs([parse.remote(p) for p in paths])


class _TableExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[str]]] = []
        self._stack: list[list[list[str]]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None

    def _close_cell(self):
        if self._cell is not None and self._row is not None:
            self._row.append(" ".join("".join(self._cell).split()))
        self._cell = None

    def _close_row(self):
        self._close_cell()
        if self._row is not None and self._stack:
            self._stack[-1].append(self._row)
        self._row = None

    def handle_starttag(self, tag, attrs):
        # implicit closes: real-world HTML omits </td>/</tr> freely
        if tag == "table":
            self._close_row()
            self._stack.append([])
        elif tag == "tr" and self._stack:
            self._close_row()
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._close_cell()
            self._cell = []

    def handle_endtag(self, tag):
        if tag in ("td", "th"):
            self._close_cell()
        elif tag == "tr":
            self._close_row()
        elif tag == "table" and self._stack:
            self._close_row()
            self.tables.append(self._stack.pop())

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data)


def parse_html_tables(html: str) -> list[pa.Table]:
    """Every ``<table>`` in the document as an Arrow table: first row =
    header (generated names when headerless/ragged), all-string columns
    (HTML carries no types; downstream casts are explicit)."""
    p = _TableExtractor()
    p.feed(html or "")
    p.close()
    out = []
    for grid in p.tables:
        if not grid:
            continue
        width = max(len(r) for r in grid)
        head, body = grid[0], grid[1:]
        names: list[str] = []
        for i in range(width):
            nm = head[i].strip() if i < len(head) and head[i].strip() else f"col{i}"
            while nm in names:  # duplicate header cells
                nm += "_"
            names.append(nm)
        cols = {
            names[i]: pa.array(
                [r[i] if i < len(r) else None for r in body], pa.string())
            for i in range(width)
        }
        out.append(pa.table(cols))
    return out


class HtmlTableStage:
    """Actor-pool ``map_batches`` stage: explode a column of fetched HTML
    page bodies into one row per table cell row —
    ``(<id cols>, table_idx, row_idx, <cell cols as col0..colN>)`` with the
    header row carried as column names per table being impossible across a
    heterogeneous batch, cells land in positional ``col<i>`` columns and
    ``header_<i>`` carries each table's header (flat, joinable downstream).
    Pairs with stages/fetch.py: fetch returns page bodies, this parses them
    — the reference's BeautifulSoup extraction as a streaming stage."""

    def __init__(self, html_column: str = "body", id_column: str = "url",
                 max_cols: int = 16):
        self.html_column = html_column
        self.id_column = id_column
        self.max_cols = max_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, tidx, ridx = [], [], []
        cells: list[list[str | None]] = [[] for _ in range(self.max_cols)]
        headers: list[list[str | None]] = [[] for _ in range(self.max_cols)]
        id_vals = t[self.id_column].to_pylist()
        for rid, html in zip(id_vals, t[self.html_column].to_pylist()):
            p = _TableExtractor()
            p.feed(html or "")
            p.close()
            for ti, grid in enumerate(p.tables):
                if not grid:
                    continue
                head, body = grid[0], grid[1:]
                for ri, row in enumerate(body):
                    ids.append(rid)
                    tidx.append(ti)
                    ridx.append(ri)
                    for ci in range(self.max_cols):
                        cells[ci].append(row[ci] if ci < len(row) else None)
                        headers[ci].append(
                            head[ci] if ci < len(head) else None)
        cols = {
            self.id_column: pa.array(ids, pa.string()),
            "table_idx": pa.array(tidx, pa.int32()),
            "row_idx": pa.array(ridx, pa.int32()),
        }
        # ALWAYS emit all max_cols columns: emitting only populated ones
        # makes the schema data-dependent per batch, which puts
        # schema-inconsistent blocks into any downstream exchange (the
        # exact failure cdc.empty_out exists to prevent)
        for ci in range(self.max_cols):
            cols[f"col{ci}"] = pa.array(cells[ci], pa.string())
            cols[f"header_{ci}"] = pa.array(headers[ci], pa.string())
        return pa.table(cols)
