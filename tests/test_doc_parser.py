"""M6 multi-section parser: JSON-column → typed section rows via the
actor-pool flat-map stage; .get-style tolerance for missing/malformed
documents (lattes_parser parity: skip, never crash)."""

import json

import pyarrow as pa

from horizon_etl_ray.stages.doc_parser import (
    DEFAULT_SECTIONS,
    ParseDocSections,
    render_doc_json,
)


def _parse(rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "doc_json": pa.array([r[1] for r in rows], pa.string()),
    })
    return ParseDocSections()(t).to_pydict()


def test_sections_and_info_rows():
    doc = render_doc_json(7, "a b c d e f g h i j k l m n o", "pt", "lattes")
    out = _parse([(7, doc)])
    # info row present with the scalar section payload
    assert ("info", 0, "lattes") in list(
        zip(out["section"], out["idx"], out["title"]))
    # K = 12: section 'projects' (sid 0) gets words 0, 12 → a, m
    proj = [(i, ti) for s, i, ti in zip(out["section"], out["idx"],
                                        out["title"]) if s == "projects"]
    assert proj == [(0, "a"), (1, "m")]
    # articles (sid 3) gets word 3 → d
    art = [ti for s, ti in zip(out["section"], out["title"])
           if s == "articles"]
    assert art == ["d"]
    assert set(out["lang"]) == {"pt"}


def test_malformed_and_partial_documents_skip_not_crash():
    good = render_doc_json(1, "x y z", "en", "s")
    partial = json.dumps({"id": 2, "sections": {"projects": "not-a-list",
                                                "awards": [{"title": "w"}]}})
    out = _parse([(1, good), (2, "{not json"), (3, None), (2, partial)])
    # malformed (2, "{not json") and null (3) contribute nothing
    assert 3 not in out["doc_id"]
    # the partial doc still yields its info row + the well-formed section
    rows2 = [(s, ti) for d, s, ti in zip(out["doc_id"], out["section"],
                                         out["title"]) if d == 2]
    assert ("awards", "w") in rows2
    assert ("info", "") in rows2
    assert all(s != "projects" for s, _ in rows2)  # non-list section skipped


def test_no_section_assumes_full_word_coverage():
    # K = len(sections)+2 = 12 ⇒ two word slots per period are in NO section
    words = [f"w{i}" for i in range(14)]
    doc = render_doc_json(9, " ".join(words), "en", "s")
    parsed = json.loads(doc)
    used = {it["title"] for s in DEFAULT_SECTIONS
            for it in parsed["sections"][s]}
    assert {"w10", "w11"}.isdisjoint(used)
