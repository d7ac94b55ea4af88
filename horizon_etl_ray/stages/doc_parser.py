"""Multi-section document parser (M6): one JSON document → typed rows for
every section, as a flat-map-shaped actor-pool stage.

Reference parity: ``LattesParser.parse_*``
(/root/reference/src/adapters/sources/lattes_parser.py:41-601) turns one CV
JSON into 10 section row-sets (projects, articles, education, awards,
languages, …), tolerating missing keys with ``.get`` fallbacks. Here the
same shape is a single 1→N ``map_batches`` stage over a JSON string column:
each document parses once (``json.loads`` — per-document by nature, like the
reference parser) and emits one typed Arrow row per section item plus one
scalar ``info`` row (the personal-info section). Missing/odd sections are
skipped, never fatal (the ``.get`` discipline).

Scale shape: the stage is an actor-pool ``map_batches`` callable (state =
the section registry, built once per actor in ``__init__``); output rows are
columnar from per-batch Python lists — no driver involvement, documents
stream through.
"""

from __future__ import annotations

import json

import pyarrow as pa

# section name → key path inside the document's "sections" object; each
# section's items are [{"title": ...}, ...] (the reference's per-section
# list-of-dicts shape). The 10 list sections mirror the reference parser's
# section families (lattes_parser.py:41-601: projects ×3, articles,
# conference papers, academic education, awards, languages, professional
# activities, technical productions) — personal info is the scalar ``info``
# row, as there.
DEFAULT_SECTIONS = (
    "projects", "research_projects", "extension_projects", "articles",
    "conference_papers", "education", "awards", "languages",
    "professional_activities", "technical_productions",
)


class ParseDocSections:
    """Actor-pool stage: batches of (id, json) → batches of
    (id, section, idx, title, lang) — one row per section item, one
    ``info`` row per document."""

    def __init__(self, id_column: str = "doc_id", json_column: str = "doc_json",
                 sections: tuple[str, ...] = DEFAULT_SECTIONS):
        self.id_column = id_column
        self.json_column = json_column
        self.sections = tuple(sections)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        section_out: list[str] = []
        idx_out: list[int] = []
        title_out: list[str] = []
        lang_out: list[str] = []
        ids = t[self.id_column].to_pylist()
        docs = t[self.json_column].to_pylist()
        for doc_id, raw in zip(ids, docs):
            if not raw:
                continue  # empty/null document: nothing to parse
            try:
                doc = json.loads(raw)
            except (TypeError, ValueError):
                continue  # malformed document: skip, never fatal (F8 spirit)
            info = doc.get("info") or {}
            lang = str(info.get("lang") or "")
            ids_out.append(doc_id)
            section_out.append("info")
            idx_out.append(0)
            title_out.append(str(info.get("source") or ""))
            lang_out.append(lang)
            secs = doc.get("sections") or {}
            for name in self.sections:
                items = secs.get(name) or []
                if not isinstance(items, list):
                    continue
                for i, item in enumerate(items):
                    title = (item.get("title") if isinstance(item, dict)
                             else item)
                    ids_out.append(doc_id)
                    section_out.append(name)
                    idx_out.append(i)
                    title_out.append(str(title if title is not None else ""))
                    lang_out.append(lang)
        return pa.table({
            self.id_column: pa.array(ids_out, pa.int64()),
            "section": pa.array(section_out, pa.string()),
            "idx": pa.array(idx_out, pa.int64()),
            "title": pa.array(title_out, pa.string()),
            "lang": pa.array(lang_out, pa.string()),
        })


def render_doc_json(doc_id: int, text: str, lang: str, source: str,
                    words_per_section: int = 5,
                    sections: tuple[str, ...] = DEFAULT_SECTIONS) -> str:
    """Deterministic CV-shaped JSON for one document row (the test/bench
    input synthesizer — the DuckDB oracle reproduces the same section
    contents directly from ``text`` with word arithmetic): section s gets
    words ``s, s+K, s+2K, ...`` (K = len(sections) + 2 so some words fall in
    no section — parsers must not assume full coverage)."""
    words = text.split(" ")
    K = len(sections) + 2
    secs = {
        name: [{"title": w} for w in words[s::K][:words_per_section]]
        for s, name in enumerate(sections)
    }
    return json.dumps(
        {"id": doc_id, "info": {"lang": lang, "source": source},
         "sections": secs},
        sort_keys=True)
