"""Blocked fuzzy matching — the reference's multi-tier person matcher
re-expressed for Ray Data (T1/J3/D3 parity):

  exact tiers (email / canonical / raw / normalized) = hash joins;
  the fuzzy tier = ``token_sort_ratio ≥ threshold`` evaluated ONLY within a
  canonical-key block (blocking strategy), i.e. a ``groupby(block_key)``
  + pairwise scoring per group
  (/root/reference/src/core/logic/person_matcher.py:161-259; strict mode
  requires an exact 100 — :216-241).

No external fuzz library in this environment: ``token_sort_ratio`` is
implemented on stdlib ``difflib.SequenceMatcher`` (same definition — ratio
of the token-sorted strings, scaled to 0..100).
"""

from __future__ import annotations

import difflib

import pandas as pd

from .scalars import canonicalize_name, normalize_name


def token_sort_ratio(a: str, b: str) -> int:
    """Ratio (0..100) of the whitespace-token-sorted forms."""
    ta = " ".join(sorted((a or "").split()))
    tb = " ".join(sorted((b or "").split()))
    if not ta and not tb:
        return 100
    return round(100 * difflib.SequenceMatcher(None, ta, tb).ratio())


def block_key(name: str) -> str:
    """Blocking key: first + last token of the canonical name — cheap, stable
    under middle-name variation (the unit the reference scopes its fuzzy scan
    to via canonical-name caches)."""
    toks = [t for t in canonicalize_name(name).split() if t and t[0].isupper()]
    if not toks:
        return ""
    return f"{toks[0]}|{toks[-1]}"


class FuzzyBlocker:
    """map_batches stage: adds ``norm_name`` + ``block`` columns (compiled
    normalization state per actor)."""

    def __init__(self, name_column: str = "name"):
        self.name_column = name_column

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["norm_name"] = batch[self.name_column].map(normalize_name)
        batch["block"] = batch[self.name_column].map(block_key)
        return batch


def fuzzy_match_pairs(ds, name_column: str = "name", id_column: str = "id",
                      threshold: int = 90, strict: bool = False,
                      concurrency=(1, 4), max_block: int = 512,
                      scorer: str = "token_sort_ratio"):
    """Candidate duplicate pairs: block on (first,last) canonical tokens,
    score within blocks only. ``strict=True`` ⇒ ratio must be exactly 100
    (the reference's strict mode). ``max_block`` caps the O(B²) scan per
    block (the hot-bucket guard of minhash_lsh_groups): an adversarial
    block beyond it is truncated to the max_block smallest ids — a block
    that large carries no dedup signal anyway.

    ``scorer``: ``"token_sort_ratio"`` (difflib Ratcliff-Obershelp — the
    reference's thefuzz semantics) or ``"lev_token_sort_ratio"``
    (Levenshtein ratio of the token-sorted forms — same 0..100 contract,
    chosen when the dedup policy must be SQL-auditable: DuckDB reproduces
    it exactly via ``levenshtein()``; see entity_resolution.py)."""
    import ray.data as rd  # noqa: F401

    from .entity_resolution import lev_token_sort_ratio

    blocked = ds.map_batches(
        FuzzyBlocker, fn_constructor_kwargs=dict(name_column=name_column),
        batch_format="pandas", concurrency=concurrency,  # pandas: actor-pool banded-Levenshtein stage
    )

    minimum = 100 if strict else threshold
    score = {"token_sort_ratio": token_sort_ratio,
             "lev_token_sort_ratio": lev_token_sort_ratio}[scorer]

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(id_column).drop_duplicates(subset=[id_column])
             .head(max_block))
        ids = g[id_column].to_list()
        names = g["norm_name"].to_list()
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                r = score(names[i], names[j])
                if r >= minimum:
                    rows.append((ids[i], ids[j], r))
        if not rows:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "ratio": pd.Series([], dtype="int64")})
        return pd.DataFrame(rows, columns=["id_a", "id_b", "ratio"])

    nonempty = blocked.map_batches(
        lambda b: b[b["block"] != ""], batch_format="pandas"  # pandas: trivial block filter on tiny blocked frame
    )
    return nonempty.groupby("block").map_groups(pairs, batch_format="pandas")
