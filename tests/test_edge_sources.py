"""Edge-source readers: xlsx (zip+XML, no openpyxl) and HTML tables
(stdlib parser, no bs4) — fixture-based, per VERDICT r3 missing #4."""

import zipfile

import pyarrow as pa
import pytest

from horizon_etl_ray.sources.edge import (HtmlTableStage, parse_html_tables,
                                          read_xlsx_dataset, read_xlsx_table)

_SHEET_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1">
 <c r="A1" t="s"><v>0</v></c>
 <c r="B1" t="s"><v>1</v></c>
 <c r="C1" t="s"><v>2</v></c>
</row>
<row r="2">
 <c r="A2" t="s"><v>3</v></c>
 <c r="B2"><v>42</v></c>
 <c r="C2"><v>1.5</v></c>
</row>
<row r="3">
 <c r="A3" t="inlineStr"><is><t>in line</t></is></c>
 <c r="C3"><v>2.5</v></c>
</row>
</sheetData>
</worksheet>"""

_SHARED_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
<si><t>name</t></si>
<si><t>count</t></si>
<si><t>ratio</t></si>
<si><r><t>ri</t></r><r><t>ch</t></r></si>
</sst>"""


@pytest.fixture()
def xlsx_path(tmp_path):
    p = tmp_path / "manual_input.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/workbook.xml", "<workbook/>")
        zf.writestr("xl/sharedStrings.xml", _SHARED_XML)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET_XML)
    return str(p)


def test_read_xlsx_table(xlsx_path):
    t = read_xlsx_table(xlsx_path)
    assert t.column_names == ["name", "count", "ratio"]
    # shared string, rich-text runs, inline string; missing cell → null
    assert t["name"].to_pylist() == ["rich", "in line"]
    assert t["count"].to_pylist() == [42, None]        # all-integral → int64
    assert t["count"].type == pa.int64()
    assert t["ratio"].to_pylist() == [1.5, 2.5]        # fractional → float64
    assert t["ratio"].type == pa.float64()


def test_read_xlsx_headerless_and_dataset(xlsx_path, ray_session):
    t = read_xlsx_table(xlsx_path, header=False)
    assert t.column_names == ["col0", "col1", "col2"]
    assert t.num_rows == 3
    ds = read_xlsx_dataset([xlsx_path, xlsx_path])
    df = ds.to_pandas()
    assert len(df) == 4  # 2 body rows per workbook
    assert set(df["_source_file"]) == {xlsx_path}


_HTML = """
<html><head><title>r</title></head><body>
<h1>Report</h1>
<table>
  <tr><th>campus</th><th> projects </th></tr>
  <tr><td>North&nbsp;Campus</td><td><b>12</b></td></tr>
  <tr><td>South</td><td>7</td><td>ragged-extra</td></tr>
</table>
<p>between</p>
<table><tr><td>headerless</td><td>x</td></tr><tr><td>a</td><td>b</td></tr></table>
</body></html>
"""


def test_parse_html_tables():
    tables = parse_html_tables(_HTML)
    assert len(tables) == 2
    t0 = tables[0]
    assert t0.column_names[:2] == ["campus", "projects"]
    assert t0["campus"].to_pylist() == ["North Campus", "South"]
    assert t0["projects"].to_pylist() == ["12", "7"]  # nested <b> flattened
    assert t0.column(2).to_pylist() == [None, "ragged-extra"]
    # second table: first row is treated as header (reference's tables carry
    # headers; headerless tables degrade to that row as names)
    assert tables[1].num_rows == 1


def test_html_table_stage_batch():
    batch = pa.table({
        "url": ["u1", "u2", "u3"],
        "body": [_HTML, "<p>no tables here</p>", None],
    })
    out = HtmlTableStage()(batch)
    assert out["url"].to_pylist() == ["u1", "u1", "u1"]
    assert out["table_idx"].to_pylist() == [0, 0, 1]
    assert out["col0"].to_pylist() == ["North Campus", "South", "a"]
    assert out["header_0"].to_pylist() == ["campus", "campus", "headerless"]


def test_parse_html_tables_empty_and_malformed():
    assert parse_html_tables("") == []
    assert parse_html_tables("<table></table>") == []
    # unclosed tags: parser is forgiving, no crash
    ts = parse_html_tables("<table><tr><td>a<td>b<tr><td>c</table>")
    assert len(ts) == 1 and ts[0].num_rows == 1


def test_xlsx_sheet_index_is_numeric_not_lexicographic(tmp_path):
    """sheet10.xml must not sort before sheet2.xml: with 10+ worksheets a
    lexicographic sort maps sheet=1 to sheet10 (silently wrong table)."""
    def sheet_with_value(v):
        return (
            '<?xml version="1.0"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            f'<row r="1"><c r="A1"><v>{v}</v></c></row>'
            '</sheetData></worksheet>'
        )

    p = tmp_path / "many_sheets.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        for i in range(1, 13):  # sheet1..sheet12
            zf.writestr(f"xl/worksheets/sheet{i}.xml",
                        sheet_with_value(i * 100))
    for idx, want in [(0, 100), (1, 200), (9, 1000), (11, 1200)]:
        t = read_xlsx_table(str(p), sheet=idx, header=False)
        assert t["col0"].to_pylist() == [want], (idx, t["col0"].to_pylist())


def test_xlsx_nan_inf_cells_stay_string(tmp_path):
    """'NaN'/'Infinity'/'1e999' parse as float but are not finite — they
    must degrade the column to string, not crash the integral check."""
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>v</t></is></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>NaN</t></is></c></row>'
        '<row r="3"><c r="A3" t="inlineStr"><is><t>1e999</t></is></c></row>'
        '<row r="4"><c r="A4"><v>3</v></c></row>'
        '</sheetData></worksheet>'
    )
    p = tmp_path / "nan.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    t = read_xlsx_table(str(p))
    assert t["v"].type == pa.string()
    assert t["v"].to_pylist() == ["NaN", "1e999", "3"]


def test_xlsx_duplicate_headers_keep_all_columns(tmp_path):
    """Two columns both headed 'amount' must both survive (suffix dedup,
    same policy as the HTML path) — a dict would keep only the last one."""
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>amount</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>amount</t></is></c>'
        '</row>'
        '<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c></row>'
        '</sheetData></worksheet>'
    )
    p = tmp_path / "dup.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    t = read_xlsx_table(str(p))
    assert t.column_names == ["amount", "amount_"]
    assert t["amount"].to_pylist() == [1]
    assert t["amount_"].to_pylist() == [2]


def test_html_table_stage_schema_is_batch_invariant():
    """A batch whose pages contain no tables (or narrower tables) must emit
    the SAME column set as a table-bearing batch — data-dependent schemas
    put inconsistent blocks into any downstream exchange."""
    stage = HtmlTableStage(max_cols=4)
    with_tables = stage(pa.table({"url": ["u1"], "body": [_HTML]}))
    empty = stage(pa.table({"url": ["u2"], "body": ["<p>none</p>"]}))
    assert with_tables.column_names == empty.column_names
    assert empty.num_rows == 0
    narrow = stage(pa.table({
        "url": ["u3"],
        "body": ["<table><tr><th>h</th></tr><tr><td>x</td></tr></table>"],
    }))
    assert narrow.column_names == with_tables.column_names
    assert narrow["col3"].to_pylist() == [None]
