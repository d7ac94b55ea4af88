"""Entity-resolution cascade: exact tiers → blocked fuzzy → claim resolution.

Composes the reference's multi-tier person matcher as ONE operator
(/root/reference/src/core/logic/person_matcher.py:161-259 — match order
email-exact → canonical → raw → normalized → fuzzy≥90, first tier that hits
wins) with the greedy claim-dedup of
/root/reference/src/core/logic/project_enrichment.py:147-209 (claims sorted
by confidence; an entity keeps only its best claim — here per-entity argmax
with a deterministic (score desc, incoming id asc) tiebreak).

Ray shape (T1/T2 parity): the registry is the SMALL side — its tier lookup
tables are built once and broadcast via ``ray.put`` (the reference preloads
the same caches into process memory, person_matcher.py:20-72); incoming
records stream through an actor-pool ``map_batches`` stage that applies the
cascade vectorized per tier, dropping to per-row scoring only for the fuzzy
remainder inside its block. For a registry too large to broadcast,
hash-partition BOTH sides by block key and run the same cascade per
partition (the attach_doc_column co-shuffle recipe in functions/dedup.py).

The fuzzy scorer is a token-sort Levenshtein ratio —
``round(100 * (1 - lev(ts_a, ts_b) / max(len(ts_a), len(ts_b), 1)))`` —
chosen over difflib's gestalt ratio because DuckDB can reproduce it exactly
(``levenshtein()``), making the whole cascade oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_TIER_RAW, _TIER_NORM, _TIER_FUZZY, _TIER_NONE = "raw", "normalized", "fuzzy", "none"


def normalize_loose(name: str) -> str:
    """lower, non-alnum→space, collapse — the SQL twin is
    ``trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ', 'g'))``."""
    import re

    s = re.sub(r"[^a-z0-9]+", " ", (name or "").lower())
    return " ".join(s.split())


def token_sort(name: str) -> str:
    return " ".join(sorted(normalize_loose(name).split()))


def block_key_loose(name: str) -> str:
    toks = normalize_loose(name).split()
    if not toks:
        return ""
    return f"{toks[0]}|{toks[-1]}"


def levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance (unit costs) — matches DuckDB levenshtein()."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _lev_banded(a: str, b: str, k: int) -> int | None:
    """Exact edit distance if ≤ k, else None (Ukkonen band of width 2k+1 —
    O(len·k) instead of O(len²); the cascade only needs distances that beat
    the current best score, so the band prunes most candidates)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return None
    if k <= 0:
        return 0 if a == b else None
    big = k + 1
    prev = [j if j <= k else big for j in range(lb + 1)]
    for i in range(1, la + 1):
        cur = [big] * (lb + 1)
        if i <= k:
            cur[0] = i
        lo, hi = max(1, i - k), min(lb, i + k)
        row_min = big
        ai = a[i - 1]
        for j in range(lo, hi + 1):
            c = prev[j - 1] + (ai != b[j - 1])
            if prev[j] + 1 < c:
                c = prev[j] + 1
            if cur[j - 1] + 1 < c:
                c = cur[j - 1] + 1
            if c < big:
                cur[j] = c
                if c < row_min:
                    row_min = c
        if row_min >= big and (i > k or cur[0] >= big):
            return None  # the whole band exceeded k — no path back under it
        prev = cur
    return prev[lb] if prev[lb] <= k else None


def lev_token_sort_ratio(a: str, b: str) -> int:
    import math

    ta, tb = token_sort(a), token_sort(b)
    denom = max(len(ta), len(tb), 1)
    # floor(x+0.5): half-away-from-zero, matching the SQL twin (Python's
    # round() is banker's and would flip exact .5 ratios)
    return int(math.floor(100 * (1 - levenshtein(ta, tb) / denom) + 0.5))


class RegistryIndex:
    """The broadcastable tier lookup state (built once on the driver)."""

    def __init__(self, ids: np.ndarray, names: list[str]):
        self.raw: dict[str, int] = {}
        self.norm: dict[str, int] = {}
        self.blocks: dict[str, list[tuple[int, str]]] = {}
        order = np.argsort(ids)  # min-id wins on duplicate keys
        for i in order[::-1]:
            rid, nm = int(ids[i]), names[i]
            self.raw[nm] = rid
            self.norm[normalize_loose(nm)] = rid
        for i in order:  # ascending rid — the fuzzy scan relies on this so
            # the FIRST candidate reaching the best score is the min-rid
            # tiebreak winner (later equal scores can be pruned)
            rid, nm = int(ids[i]), names[i]
            bk = block_key_loose(nm)
            if bk:
                self.blocks.setdefault(bk, []).append((rid, nm))

    @classmethod
    def from_dataset(cls, registry_ds, id_column: str, name_column: str
                     ) -> "RegistryIndex":
        t = registry_ds.select_columns([id_column, name_column]).to_pandas()
        return cls(t[id_column].to_numpy(), t[name_column].tolist())


def cascade_match(names: pd.Series, iid: np.ndarray, idx: RegistryIndex,
                  fuzzy_threshold: int) -> pd.DataFrame:
    """Apply the tier cascade to one batch of incoming (id, name) rows
    against a registry index. Exact tiers are vectorized dict lookups; the
    fuzzy tier scores only the rows that fell through, against registry
    candidates in the SAME block only, with a banded early-exit
    Levenshtein bounded by the running best score."""
    n = len(names)
    matched = np.full(n, -1, dtype=np.int64)
    tier = np.full(n, _TIER_NONE, dtype=object)
    score = np.zeros(n, dtype=np.int64)

    raw_hit = names.map(idx.raw)
    m = raw_hit.notna().to_numpy()
    matched[m] = raw_hit[m].astype(np.int64)
    tier[m] = _TIER_RAW
    score[m] = 100

    todo = ~m
    if todo.any():
        norm_names = names[todo].map(normalize_loose)
        norm_hit = norm_names.map(idx.norm)
        hit_idx = np.flatnonzero(todo)[norm_hit.notna().to_numpy()]
        matched[hit_idx] = norm_hit[norm_hit.notna()].astype(np.int64)
        tier[hit_idx] = _TIER_NORM
        score[hit_idx] = 100

    for i in np.flatnonzero(tier == _TIER_NONE):
        nm = names.iloc[i]
        cands = idx.blocks.get(block_key_loose(nm), ())
        best_rid, best_score = -1, fuzzy_threshold - 1
        ts_in = token_sort(nm)
        for rid, rname in cands:
            ts_reg = token_sort(rname)
            denom = max(len(ts_in), len(ts_reg), 1)
            # a score > best_score needs lev < denom*(1 - (best+0.5)/100)
            # (floor(x+0.5) rounding) — skip candidates whose length gap
            # alone exceeds the bound, and band the DP by it
            bound = denom * (100 - best_score - 0.5) / 100.0
            if abs(len(ts_in) - len(ts_reg)) > bound:
                continue
            d = _lev_banded(ts_in, ts_reg, int(bound))
            if d is None:
                continue
            r = int(np.floor(100 * (1 - d / denom) + 0.5))
            if r > best_score or (r == best_score and 0 <= rid < best_rid):
                best_rid, best_score = rid, r
        if best_rid >= 0:
            matched[i] = best_rid
            tier[i] = _TIER_FUZZY
            score[i] = best_score

    return pd.DataFrame({
        "incoming_id": iid,
        "matched_id": matched,
        "tier": tier.astype(str),
        "score": score,
    })


class CascadeMatcher:
    """Actor-pool stage for the broadcast-registry mode: holds the (small)
    registry index once per actor and applies ``cascade_match`` per batch."""

    def __init__(self, index_ref, id_column: str, name_column: str,
                 fuzzy_threshold: int = 90):
        import ray

        self.idx: RegistryIndex = ray.get(index_ref)
        self.id_column = id_column
        self.name_column = name_column
        self.fuzzy_threshold = fuzzy_threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return cascade_match(batch[self.name_column].fillna(""),
                             batch[self.id_column].to_numpy(),
                             self.idx, self.fuzzy_threshold)


def _resolve_claims(claims_ds, num_buckets: int = 16):
    """Per-entity argmax claim resolution (bucketed — one exchange)."""

    def route(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        key = df["matched_id"].to_numpy()
        df["_cb"] = (((key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                      >> np.uint64(32)) % np.uint64(num_buckets)
                     ).astype(np.int64)
        return df

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["matched_id", "score", "incoming_id"],
                          ascending=[True, False, True])
        won = (~g.duplicated(subset=["matched_id"])) & (g["matched_id"] >= 0)
        out = g.drop(columns=["_cb"]).copy()
        out["won"] = won.to_numpy()
        return out

    return claims_ds.map_batches(route, batch_format="pandas").groupby(  # pandas: claim-route column attach
        "_cb").map_groups(pick, batch_format="pandas")


def _block_bucket(names: pd.Series, P: int) -> np.ndarray:
    h = pd.util.hash_array(
        names.map(block_key_loose).to_numpy(dtype=object))
    return (h % np.uint64(P)).astype(np.int64)


def resolve_entities(incoming_ds, registry_ds, *, incoming_id="id",
                     incoming_name="name", registry_id="rid",
                     registry_name="name", fuzzy_threshold=90,
                     concurrency=(1, 4), mode="broadcast", num_buckets=16):
    """Run the cascade; returns a Dataset of
    ``(incoming_id, matched_id, tier, score, won)`` where ``won`` marks the
    claim each registry entity keeps (score desc, incoming_id asc; unmatched
    rows carry matched_id=-1, won=false).

    ``mode="broadcast"`` (default): the registry's tier indexes are built
    once and broadcast — faithful to the reference's preloaded matcher
    caches, right whenever the registry is the small side.
    ``mode="partitioned"``: both sides are co-shuffled on the BLOCK key and
    the cascade runs per bucket — right when the registry itself is too
    large for one machine. Correctness relies on the block key co-locating
    every tier's candidates: raw-equal names are byte-equal (same block),
    normalized-equal names share normalized tokens (same block), and the
    fuzzy tier only ever scans within a block by construction."""
    import ray

    if mode == "broadcast":
        idx = RegistryIndex.from_dataset(registry_ds, registry_id,
                                         registry_name)
        ref = ray.put(idx)
        claims = incoming_ds.map_batches(
            CascadeMatcher,
            fn_constructor_kwargs=dict(index_ref=ref, id_column=incoming_id,
                                       name_column=incoming_name,
                                       fuzzy_threshold=fuzzy_threshold),
            batch_format="pandas",  # pandas: per-bucket claim dedup
            concurrency=concurrency,
        )
        return _resolve_claims(claims, num_buckets)

    # partitioned: union-tag co-shuffle on hash(block_key) % num_buckets
    def tag_incoming(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "_id": df[incoming_id].to_numpy(dtype=np.int64),
            "_name": df[incoming_name].fillna("").to_numpy(),
        })
        out["_side"] = np.int8(0)
        out["_bb"] = _block_bucket(df[incoming_name].fillna(""), num_buckets)
        return out

    def tag_registry(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "_id": df[registry_id].to_numpy(dtype=np.int64),
            "_name": df[registry_name].fillna("").to_numpy(),
        })
        out["_side"] = np.int8(1)
        out["_bb"] = _block_bucket(df[registry_name].fillna(""), num_buckets)
        return out

    both = (incoming_ds.map_batches(tag_incoming, batch_format="pandas")  # pandas: tagged-union frame for matcher state
            .union(registry_ds.map_batches(tag_registry,
                                           batch_format="pandas")))  # pandas: tagged-union frame for matcher state

    def match_bucket(g: pd.DataFrame) -> pd.DataFrame:
        inc = g[g["_side"] == 0]
        reg = g[g["_side"] == 1]
        if len(inc) == 0:
            return pd.DataFrame({
                "incoming_id": pd.Series([], dtype="int64"),
                "matched_id": pd.Series([], dtype="int64"),
                "tier": pd.Series([], dtype="str"),
                "score": pd.Series([], dtype="int64")})
        idx = RegistryIndex(reg["_id"].to_numpy(dtype=np.int64),
                            reg["_name"].tolist())
        return cascade_match(inc["_name"].reset_index(drop=True),
                             inc["_id"].to_numpy(dtype=np.int64),
                             idx, fuzzy_threshold)

    claims = both.groupby("_bb").map_groups(match_bucket,
                                            batch_format="pandas")  # pandas: per-bucket cascade merge
    return _resolve_claims(claims, num_buckets)
