"""Schema evolution: script versioning, batch conformance, and a full
replay with mid-stream DDL (FIXTURES.md §3)."""

import pyarrow as pa

from horizon_etl_ray.stages.schema_evolution import SchemaScript, conform_table

BASE = [("repo", pa.string()), ("path", pa.string()), ("lang", pa.string()),
        ("content", pa.string())]

SCRIPT = [
    {"epoch": 3, "op": "add_column", "name": "size_bytes", "type": "int64"},
    {"epoch": 6, "op": "rename_column", "from": "lang", "to": "language"},
]


def _script():
    return SchemaScript.from_json(BASE, SCRIPT)


def test_version_per_epoch():
    s = _script()
    assert [s.schema_version(e) for e in [0, 2, 3, 5, 6, 9]] == [0, 0, 1, 1, 2, 2]


def test_fields_at_versions():
    s = _script()
    assert [n for n, _ in s.fields_at(0)] == ["repo", "path", "lang", "content"]
    assert [n for n, _ in s.fields_at(1)] == ["repo", "path", "lang", "content", "size_bytes"]
    assert [n for n, _ in s.fields_at(2)] == ["repo", "path", "language", "content", "size_bytes"]


def test_conform_old_batch_to_new_schema():
    s = _script()
    old = pa.table({"repo": ["r"], "path": ["p"], "lang": ["py"], "content": ["c"],
                    "seq": [1]})
    out = conform_table(old, s, 2)
    assert out.column_names == ["repo", "path", "language", "content", "size_bytes", "seq"]
    assert out["language"][0].as_py() == "py"
    assert out["size_bytes"][0].as_py() is None  # null-filled for old rows
    assert out["seq"][0].as_py() == 1  # engine columns pass through


def test_conform_new_batch_is_noop_shape():
    s = _script()
    new = pa.table({"repo": ["r"], "path": ["p"], "language": ["py"],
                    "content": ["c"], "size_bytes": [10]})
    out = conform_table(new, s, 2)
    assert out.column_names == ["repo", "path", "language", "content", "size_bytes"]
    assert out["size_bytes"][0].as_py() == 10


def test_conform_casts_types():
    s = _script()
    t = pa.table({"repo": ["r"], "path": ["p"], "lang": ["py"], "content": ["c"],
                  "size_bytes": pa.array([7], type=pa.int32())})
    out = conform_table(t, s, 1)
    assert out["size_bytes"].type == pa.int64()


def test_registry_idempotent_registration():
    from horizon_etl_ray.stages.schema_evolution import SchemaRegistry

    reg = SchemaRegistry(_script())
    n = reg.register_op(SCRIPT[0])
    assert n == 2  # already present — at-most-once like the migrations registry
    assert reg.version_for_epoch(6) == 2


def test_replay_with_evolution(tmp_path):
    """Events replayed across DDL epochs: final lake carries the evolved
    schema; pre-DDL rows are null-filled / renamed."""
    from horizon_etl_ray.pipelines.cdc import CdcConfig, read_lake, replay
    from horizon_etl_ray.sources.generator import EventGenConfig, write_events
    from horizon_etl_ray.state.lww import content_digest, oracle_reduce
    from horizon_etl_ray.sources.generator import generate_events_table

    gen = EventGenConfig(n_keys=120, n_events=1600, seed=13, epoch_size=400,
                         content_mean_bytes=96)
    ev, lake = str(tmp_path / "ev"), str(tmp_path / "lake")
    write_events(gen, ev)
    script = SchemaScript.from_json(
        [("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
         ("lang", pa.string()), ("content", pa.string())],
        [{"epoch": 2, "op": "add_column", "name": "size_bytes", "type": "int64"},
         {"epoch": 3, "op": "rename_column", "from": "lang", "to": "language"}],
    )
    cfg = CdcConfig(num_partitions=8, schema_script=script)
    replay(ev, lake, cfg, mode="incremental")

    out = read_lake(lake, cfg=cfg).to_pandas()
    assert "language" in out.columns and "lang" not in out.columns
    assert "size_bytes" in out.columns and out["size_bytes"].isna().all()

    # content digests still sha-exact vs the (schema-agnostic) oracle
    oracle = oracle_reduce(generate_events_table(gen).to_pylist())
    want = content_digest(list(oracle.values()))
    rows = out.sort_values(["repo", "path"])
    import hashlib

    blob = "\n".join(rows["content_sha256"])
    assert hashlib.sha256(blob.encode()).hexdigest() == want


def test_registry_as_named_actor(ray_session):
    """SchemaRegistry hosted as a named Ray actor (the multi-job coordination
    path: several writers agree on the current version through one service;
    within one job the script ships in the stage closure instead)."""
    import ray

    from horizon_etl_ray.stages.schema_evolution import SchemaRegistry, SchemaScript

    script = SchemaScript.from_json(
        [("repo", pa.string()), ("path", pa.string())],
        [{"epoch": 2, "op": "add_column", "name": "size_bytes", "type": "int64"}],
    )
    reg = ray.remote(SchemaRegistry).options(name="schema_registry_test").remote(script)
    try:
        assert ray.get(reg.version_for_epoch.remote(1)) == 0
        assert ray.get(reg.version_for_epoch.remote(2)) == 1
        op = {"epoch": 3, "op": "rename_column", "from": "repo", "to": "repository"}
        assert ray.get(reg.register_op.remote(op)) == 2
        assert ray.get(reg.register_op.remote(op)) == 2  # idempotent
        fields = dict(ray.get(reg.fields_at.remote(2)))
        assert "size_bytes" in fields and "repository" in fields
        # a second handle resolves the same named service
        again = ray.get_actor("schema_registry_test")
        assert ray.get(again.version_for_epoch.remote(3)) == 2
    finally:
        ray.kill(reg)


def test_conform_coalesces_when_both_spellings_present():
    """A permissive concat of mixed-version blocks carries BOTH the old and
    new column names, each row null in exactly one — conform must coalesce
    (not skip the rename and silently null the old rows)."""
    script = SchemaScript.from_json(
        [("k", pa.int64()), ("lang", pa.string())],
        [{"epoch": 2, "op": "rename_column", "from": "lang",
          "to": "language"}])
    old = pa.table({"k": [1], "lang": ["py"]})
    new = pa.table({"k": [2], "language": ["rs"]})
    both = pa.concat_tables([old, new], promote_options="permissive")
    out = conform_table(both, script, script.schema_version(99))
    assert "lang" not in out.column_names
    assert out["language"].to_pylist() == ["py", "rs"]


def test_delta_lake_rename_keeps_pre_rename_values(tmp_path):
    """write_mode='delta' + a rename DDL mid-history: the merge-on-read
    concat of an old-name base with new-name deltas (and the change feed's
    incremental state roll, which concats a conformed cached state with
    raw old-name deltas) must keep pre-rename rows' values."""
    import pandas as pd
    import ray.data as rd

    from horizon_etl_ray.pipelines.cdc import (CdcConfig, apply_epoch,
                                               read_changes, read_lake)

    script = SchemaScript.from_json(
        [("repo", pa.string()), ("path", pa.string()),
         ("lang", pa.string()), ("content", pa.string())],
        [{"epoch": 3, "op": "rename_column", "from": "lang",
          "to": "language"}],
    )
    cfg = CdcConfig(num_partitions=1, write_mode="delta",
                    schema_script=script,
                    payload_columns=("repo", "path", "lang", "content"))
    lake = str(tmp_path / "lake")

    def ev(rows):
        return rd.from_arrow(pa.Table.from_pylist(rows))

    apply_epoch(ev([{"repo": "r", "path": "A", "seq": 1, "op": "update",
                     "lang": "py", "content": "a1"},
                    {"repo": "r", "path": "B", "seq": 2, "op": "update",
                     "lang": "go", "content": "b1"}]), lake, 1, cfg)
    apply_epoch(ev([{"repo": "r", "path": "B", "seq": 10, "op": "update",
                     "lang": "go", "content": "b2"}]), lake, 2, cfg)
    apply_epoch(ev([{"repo": "r", "path": "C", "seq": 20, "op": "update",
                     "language": "rs", "content": "c1"}]), lake, 3, cfg)

    out = (read_lake(lake, cfg=cfg).to_pandas()
           .sort_values("path").reset_index(drop=True))
    assert "lang" not in out.columns
    assert list(out["language"]) == ["py", "go", "rs"]

    # feed windows that resolve >1 state of the same old-name partition
    # exercise the incremental roll (conformed cache + raw old-name delta)
    f = (read_changes(lake, -1, cfg=cfg).to_pandas()
         .sort_values("path").reset_index(drop=True))
    assert list(f["after_language"]) == ["py", "go", "rs"]
    f12 = read_changes(lake, 1, 2, cfg=cfg).to_pandas()
    assert list(f12["path"]) == ["B"]
    assert f12.loc[0, "after_language"] == "go"
    assert f12.loc[0, "after_content"] == "b2"
