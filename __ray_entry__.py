"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the DRIVER before this module is imported — nothing
here (nor in horizon_etl_ray) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``     : flagship CDC replay on a deterministic synthetic tail at
                    smoke scale — generate → validate → hash-partition →
                    LWW merge → manifest commit → return committed lake view.
- ``queries()``   : one callable per implemented operator/pipeline from
                    SURVEY.md §2 + the training-data operator suite.
- ``oracle_sql()``: DuckDB-equivalent SQL (same column names) for every
                    SQL-expressible query; non-SQL ops (LSH dedup, IVF ANN,
                    full CDC engine runs) are rows-only here and oracle-
                    verified in tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from horizon_etl_ray.pipelines import analytics, corpus, engine_queries


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full CDC engine replay
    (the committed lake view as a pandas DataFrame; ≥0 rows, stable schema)."""
    return corpus.cdc_replay_synthetic("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    out.update(analytics.QUERIES)
    out.update(corpus.QUERIES)
    out.update(engine_queries.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(analytics.ORACLE_SQL)
    out.update(corpus.ORACLE_SQL)
    out.update(engine_queries.ORACLE_SQL)
    return out
