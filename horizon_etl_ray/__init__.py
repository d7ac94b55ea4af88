"""horizon_etl_ray — a Ray-Data-native CDC / incremental-ingest engine.

Re-expresses the query and data-processing capabilities of the reference
engine (``ifesserra-lab/horizon_etl``, studied at /root/reference) as an
idiomatic Ray Data pipeline: a binlog/WAL tail of repo-file change events
(insert/update/delete keyed on (repo, path), versioned by commit order) is

    read_parquet  →  validate (stateless map_batches over zero-copy Arrow)
                  →  hash-partition by key
                  →  last-writer-wins merge with tombstone deletes
                  →  epoch-fenced, exactly-once Parquet lake commit
                     with a per-partition checkpoint manifest.

Schema evolution (add/rename columns mid-replay) is handled by a schema
registry that rewrites batch schemas in flight, the Arrow analog of the
reference's guarded ``ALTER TABLE`` migration registry
(/root/reference/src/db/migrations.py:19-58).

Layout:
  functions/   scalar + vectorized column kernels (normalize, hash, text,
               dedup, similarity)
  stages/      map_batches stages (validate, schema evolution, multimodal)
  sources/     deterministic change-event generator (no external data)
  state/       LWW merge semantics, manifest store, oracle reducer
  pipelines/   end-to-end pipelines (cdc replay, analytics queries)
"""

__version__ = "0.1.0"
