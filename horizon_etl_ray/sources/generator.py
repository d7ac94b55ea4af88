"""Deterministic synthetic change-event generator (FIXTURES.md §1-§2).

Produces the binlog/WAL tail the engine replays: repo-file change events
``(seq, op, repo, path, commit, lang, content, epoch)`` with
  - per-key strictly increasing ``seq``; first op per key is ``insert``;
  - the only op after a ``delete`` is a re-``insert`` (resurrection);
  - a duplicate-delivery knob (events re-emitted with the same seq —
    exactly-once dedup test, analog of the payload-hash UNIQUE at
    /root/reference/src/tracking/entities/source_record.py:10-17);
  - a hot-key knob (fraction of events aimed at the hot repo's keys — skew
    test, SURVEY.md §4);
  - content derived purely from ``(seed, repo, path, version)`` so every run
    and every parallelism level produces byte-identical inputs.

The *plan* (which key each seq touches, its within-key rank, its op) is
computed vectorized on the driver with numpy; the expensive per-row work
(sha1 commit ids, sha256-derived content bodies) is fanned out over Ray via
``map_batches`` on a ``range`` dataset, with the plan arrays shipped ONCE via
``ray.put`` and sliced per batch (broadcast, not re-shipped per batch).
At the 10^10-event target the plan itself would be sharded by seq-range; at
sandbox scales (≤ 2·10^7) the few int64 plan arrays fit the driver easily.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

LANGS = ("py", "rs", "go", "ts", "java", "c")


@dataclass
class EventGenConfig:
    n_keys: int = 500
    n_events: int = 5000
    seed: int = 42
    n_orgs: int = 7
    n_repos: int = 23
    hot_fraction: float = 0.2  # fraction of keys owned by the hot repo (repo 0)
    hot_event_fraction: float | None = None  # extra skew: events aimed at hot keys
    p_delete: float = 0.10
    dup_fraction: float = 0.0  # duplicate-delivery knob
    epoch_size: int = 1000
    content_mean_bytes: int = 256
    content_sigma: float = 0.8
    content_max_bytes: int = 65536


def repo_of_key(cfg: EventGenConfig, key: int) -> str:
    # max(1, ...): must agree with plan_events' clamp — otherwise a tiny
    # hot_fraction aims the skewed stream at key 0 while key 0 maps to a
    # non-hot repo, silently detargeting the skew knob
    hot_keys = max(1, int(cfg.n_keys * cfg.hot_fraction))
    if key < hot_keys:
        r = 0
    else:
        r = (key % (cfg.n_repos - 1)) + 1
    return f"org{(r * 2654435761) % cfg.n_orgs}/repo{r}"


def path_of_key(cfg: EventGenConfig, key: int) -> str:
    lang = LANGS[key % len(LANGS)]
    return f"src/m{key // 64}/f{key}.{lang}"


def lang_of_key(key: int) -> str:
    return LANGS[key % len(LANGS)]


def make_commit(seed: int, repo: str, path: str, version: int) -> str:
    return hashlib.sha1(f"{seed}:{repo}:{path}:{version}".encode()).hexdigest()


def make_content(seed: int, repo: str, path: str, version: int, size: int) -> str:
    header = f"// {repo}/{path} v{version}\n"
    body_unit = hashlib.sha256(f"{seed}:{repo}:{path}:{version}".encode()).hexdigest()
    need = max(0, size - len(header))
    body = (body_unit * (need // len(body_unit) + 1))[:need]
    return header + body


@dataclass
class EventPlan:
    """Vectorized plan: for each output row i (seq-ordered, duplicates
    appended with their original seq), the key, within-key version rank, op
    code (0=insert 1=update 2=delete) and content size."""

    cfg: EventGenConfig
    seq: np.ndarray
    key: np.ndarray
    rank: np.ndarray
    op_code: np.ndarray
    size: np.ndarray

    @property
    def n_rows(self) -> int:
        return len(self.seq)


def plan_events(cfg: EventGenConfig) -> EventPlan:
    rng = np.random.default_rng(cfg.seed)
    n = cfg.n_events
    hot_keys = max(1, int(cfg.n_keys * cfg.hot_fraction))

    key = rng.integers(0, cfg.n_keys, size=n, dtype=np.int64)
    if cfg.hot_event_fraction:
        hot_mask = rng.random(n) < cfg.hot_event_fraction
        key[hot_mask] = rng.integers(0, hot_keys, size=int(hot_mask.sum()))

    # within-key rank in seq order (seq == index here)
    order = np.argsort(key, kind="stable")
    sorted_key = key[order]
    boundary = np.empty(n, dtype=bool)
    if n:
        boundary[0] = True
        boundary[1:] = sorted_key[1:] != sorted_key[:-1]
    group_start = np.flatnonzero(boundary)
    counts = np.diff(np.append(group_start, n))
    rank_sorted = np.arange(n) - np.repeat(group_start, counts)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = rank_sorted

    # op state machine: first op of a key is insert; an op right after a
    # delete is insert (resurrection); otherwise delete with prob p, else
    # update. The scan recurrence s[i] = c[i] & ~s[i-1] (s = "this op is a
    # delete", c = "delete candidate") closes in closed form: every maximal
    # run of consecutive candidates starts in state False, so deletes sit at
    # EVEN offsets within each candidate run — fully vectorized, O(n)
    # regardless of the per-key event count (the old per-rank loop was
    # O(n × max_rank): quadratic for an adversarially hot key).
    u = rng.random(n)
    u_sorted = u[order]
    is_first = rank_sorted == 0
    c = (u_sorted < cfg.p_delete) & ~is_first  # delete candidates
    idx = np.arange(n, dtype=np.int64)
    run_start = c & ~np.r_[False, c[:-1]]
    start_ff = np.maximum.accumulate(np.where(run_start, idx, -1))
    offset = idx - start_ff  # position within the current candidate run
    delete = c & (offset % 2 == 0)
    prev_delete = np.r_[False, delete[:-1]] & ~is_first
    op_sorted = np.ones(n, dtype=np.int8)  # default update
    op_sorted[prev_delete] = 0  # resurrection insert
    op_sorted[delete] = 2
    op_sorted[is_first] = 0
    op_code = np.empty(n, dtype=np.int8)
    op_code[order] = op_sorted

    sizes = rng.lognormal(
        mean=math.log(max(cfg.content_mean_bytes, 64)), sigma=cfg.content_sigma, size=n
    )
    size = np.clip(sizes, 64, cfg.content_max_bytes).astype(np.int64)
    size[op_code == 2] = 0  # tombstones carry empty content

    seq = np.arange(n, dtype=np.int64)

    if cfg.dup_fraction > 0:
        k = int(n * cfg.dup_fraction)
        dup_idx = rng.choice(n, size=k, replace=False)
        seq = np.concatenate([seq, seq[dup_idx]])
        key = np.concatenate([key, key[dup_idx]])
        rank = np.concatenate([rank, rank[dup_idx]])
        op_code = np.concatenate([op_code, op_code[dup_idx]])
        size = np.concatenate([size, size[dup_idx]])

    return EventPlan(cfg=cfg, seq=seq, key=key, rank=rank, op_code=op_code, size=size)


_OP_NAMES = np.array(["insert", "update", "delete"])


def build_rows(plan_slice: dict[str, np.ndarray], cfg: EventGenConfig) -> pa.Table:
    """Materialize event rows for a slice of the plan (runs inside Ray
    tasks; per-row hashing is the intended work)."""
    seqs = plan_slice["seq"]
    keys = plan_slice["key"]
    ranks = plan_slice["rank"]
    ops = plan_slice["op_code"]
    sizes = plan_slice["size"]
    n = len(seqs)
    repos, paths, commits, langs, contents = [], [], [], [], []
    seed = cfg.seed
    for i in range(n):
        k = int(keys[i])
        r = repo_of_key(cfg, k)
        p = path_of_key(cfg, k)
        v = int(ranks[i])
        repos.append(r)
        paths.append(p)
        langs.append(lang_of_key(k))
        commits.append(make_commit(seed, r, p, v))
        if ops[i] == 2:
            contents.append("")
        else:
            contents.append(make_content(seed, r, p, v, int(sizes[i])))
    epoch = (seqs // cfg.epoch_size).astype(np.int64)
    return pa.table(
        {
            "seq": pa.array(seqs, type=pa.int64()),
            "op": pa.array(_OP_NAMES[ops]),
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
            "epoch": pa.array(epoch, type=pa.int64()),
        }
    )


def generate_events_table(cfg: EventGenConfig) -> pa.Table:
    """Single-process generation (tests / small scales)."""
    plan = plan_events(cfg)
    t = build_rows(
        {
            "seq": plan.seq,
            "key": plan.key,
            "rank": plan.rank,
            "op_code": plan.op_code,
            "size": plan.size,
        },
        cfg,
    )
    return t.sort_by("seq")


def generate_events_dataset(cfg: EventGenConfig, parallelism: int | None = None):
    """Distributed generation: plan on the driver, rows built in Ray tasks.

    The plan arrays are put in the object store ONCE and read by every task
    (broadcast pattern) — they are indexed by the ``range`` dataset's ``id``.
    """
    import ray
    import ray.data as rd

    plan = plan_events(cfg)
    refs = {
        "seq": ray.put(plan.seq),
        "key": ray.put(plan.key),
        "rank": ray.put(plan.rank),
        "op_code": ray.put(plan.op_code),
        "size": ray.put(plan.size),
    }

    class BuildRows:
        def __init__(self, refs, cfg):
            self.plan = {k: ray.get(v) for k, v in refs.items()}
            self.cfg = cfg

        def __call__(self, batch: dict) -> pa.Table:
            ids = batch["id"]
            plan_slice = {k: v[ids] for k, v in self.plan.items()}
            return build_rows(plan_slice, self.cfg)

    n = plan.n_rows
    # autoscaling pool (1, N): never larger than the cluster, never blocks
    # waiting for actors the cluster can't schedule
    cluster_cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    max_actors = parallelism or max(2, cluster_cpus)
    ds = rd.range(n, override_num_blocks=max(max_actors * 2, 8))
    return ds.map_batches(
        BuildRows,
        fn_constructor_args=(refs, cfg),
        batch_format="numpy",
        batch_size=65536,
        concurrency=(1, max_actors),
    )


def write_events(cfg: EventGenConfig, out_dir: str, parallelism: int | None = None) -> None:
    """Generate and write the event log partitioned by epoch (the layout the
    tailer reads one micro-batch at a time)."""
    ds = generate_events_dataset(cfg, parallelism)
    ds.write_parquet(out_dir, partition_cols=["epoch"], compression="zstd")
