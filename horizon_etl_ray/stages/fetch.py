"""External-fetch stage: actor-pool `map_batches` over a URL table (S6/S7
parity — /root/reference/src/adapters/sources/cnpq_crawler.py:37-204 crawls
with a stateful HTTP session; /root/reference/src/adapters/sources/sigpesq/
adapter.py:98-136 wraps downloads in a 429 retry/backoff ×3).

There is NO network in this environment, so the TRANSPORT is injectable
(a callable ``url -> bytes``; the default raises, clearly marked). What is
real, tested engine surface:

- the actor-pool shape: session/transport state built once per actor in
  ``__init__`` (a real deployment passes ``make_transport=lambda:
  requests.Session().get``-style factory), work per batch in ``__call__``;
- bounded exponential-backoff retry on ``RetryableFetchError`` (the
  reference's 429 policy), attempt counting;
- dead-letter discipline (F8): a row that exhausts retries or raises a
  non-retryable error is NOT dropped and does NOT poison the batch — it
  comes back with ``status='failed'`` and the error message, so a
  downstream filter can quarantine it while successes continue.

Scale notes: fetches are latency-bound, not CPU-bound — size the pool with
``concurrency=(1, N)`` and small ``num_cpus`` (e.g. 0.25) so many actors
overlap I/O; payloads are opaque ``binary`` (compose with
stages/multimodal.py for decode).
"""

from __future__ import annotations

import time

import pyarrow as pa


class RetryableFetchError(Exception):
    """Transient transport failure (HTTP 429/5xx, timeout): retry with
    backoff. Any other exception from the transport is permanent and
    dead-letters the row immediately."""


def _no_network_stub(url: str) -> bytes:
    raise NotImplementedError(
        "no network in this environment — inject a transport "
        "(FetchStage(make_transport=...))"
    )


class FetchStage:
    """Actor-pool fetch: ``ds.map_batches(FetchStage, batch_format='pyarrow',
    concurrency=(1, N), num_cpus=0.25, fn_constructor_kwargs=...)``.

    Output schema: (url, payload binary, status str, attempts int32,
    error str) — one row per input row, order preserved.
    """

    def __init__(self, make_transport=None, url_column: str = "url",
                 max_retries: int = 3, backoff_s: float = 0.05,
                 sleep=time.sleep):
        self.url_column = url_column
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.sleep = sleep
        # once per actor: build the stateful session/transport
        self.transport = (make_transport or (lambda: _no_network_stub))()

    def _fetch_one(self, url: str):
        delay = self.backoff_s
        for attempt in range(1, self.max_retries + 1):
            try:
                return self.transport(url), "ok", attempt, ""
            except RetryableFetchError as e:
                if attempt == self.max_retries:
                    return b"", "failed", attempt, f"retries exhausted: {e}"
                self.sleep(delay)
                delay *= 2  # exponential backoff, reference 429 policy
            except Exception as e:  # permanent → dead-letter immediately
                return b"", "failed", attempt, f"{type(e).__name__}: {e}"
        return b"", "failed", self.max_retries, "unreachable"

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads, statuses, attempts, errors = [], [], [], []
        for v in t[self.url_column]:
            p, s, a, e = self._fetch_one(v.as_py())
            payloads.append(p)
            statuses.append(s)
            attempts.append(a)
            errors.append(e)
        return pa.table({
            self.url_column: t[self.url_column],
            "payload": pa.array(payloads, type=pa.binary()),
            "status": pa.array(statuses, type=pa.string()),
            "attempts": pa.array(attempts, type=pa.int32()),
            "error": pa.array(errors, type=pa.string()),
        })


def split_dead_letters(ds):
    """(ok_ds, failed_ds) — route exhausted/failed fetches to a quarantine
    Dataset (F8 discipline) while successes continue down the pipeline."""
    ok = ds.filter(expr="status == 'ok'")
    failed = ds.filter(expr="status == 'failed'")
    return ok, failed
