"""Composed corpus-prep pipeline: end-to-end invariants of the surviving
corpus (oracle-independent — the SQL twin is checked by the parity gate)."""

import pyarrow.parquet as pq

from horizon_etl_ray.functions.dedup import jaccard
from horizon_etl_ray.pipelines.corpus import clean_corpus

SF = "/root/testdata/sf0.001"


def test_clean_corpus_invariants():
    out = clean_corpus(SF)
    assert len(out) > 0
    # every survivor passed the gates
    assert (out["lang_pred"] == "en").all()
    assert (out["quality"] >= 0.5).all()
    # survivors are a subset of the input, ids unique
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = set(src["doc_id"].to_pylist())
    assert set(out["doc_id"]).issubset(ids)
    assert out["doc_id"].is_unique

    texts = dict(zip(src["doc_id"].to_pylist(), src["text"].to_pylist()))
    kept = [texts[i] for i in out["doc_id"]]
    # no exact duplicates survive
    assert len(set(kept)) == len(kept)
    # no surviving pair is a near-dup at the threshold (policy: the higher
    # id of every verified pair was dropped)
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            assert jaccard(kept[i], kept[j]) < 0.5


def test_clean_corpus_stricter_gate_applies():
    # note: strict-survivors ⊄ loose-survivors in general (removing a doc's
    # lower-id near-dup partner at the gate can revive the doc), so the
    # contract is the gate itself, not set inclusion
    strict = clean_corpus(SF, quality_min=0.7)
    assert (strict["quality"] >= 0.7).all()
    assert len(strict) <= len(clean_corpus(SF, quality_min=0.0))


def test_distributed_join_path_matches_broadcast_path():
    # broadcast_threshold=0 forces BOTH scale fallbacks at once: the
    # exact-dedup Dataset.join semi-join and the loser-removal left_anti
    # join; the survivor set must be identical to the broadcast path
    import pandas as pd

    a = clean_corpus(SF)
    b = clean_corpus(SF, broadcast_threshold=0)
    pd.testing.assert_frame_equal(a, b)
