"""External-fetch stage (S6/S7 plumbing): retry/backoff policy, dead-letter
routing, actor-pool integration — transport injected (no network here)."""

import pyarrow as pa
import pytest

from horizon_etl_ray.stages.fetch import (FetchStage, RetryableFetchError,
                                          split_dead_letters)


def _urls(*us):
    return pa.table({"url": pa.array(list(us))})


def test_retry_then_success_counts_attempts():
    calls = {}

    def make_transport():
        def t(url):
            calls[url] = calls.get(url, 0) + 1
            if calls[url] < 3:
                raise RetryableFetchError("429")
            return f"body:{url}".encode()
        return t

    slept = []
    st = FetchStage(make_transport=make_transport, sleep=slept.append)
    out = st(_urls("a", "b"))
    assert out["status"].to_pylist() == ["ok", "ok"]
    assert out["attempts"].to_pylist() == [3, 3]
    assert out["payload"].to_pylist() == [b"body:a", b"body:b"]
    # exponential backoff: two sleeps per url, second is double the first
    assert slept == [0.05, 0.1, 0.05, 0.1]


def test_retries_exhausted_dead_letters_row_not_batch():
    def make_transport():
        def t(url):
            if url == "bad":
                raise RetryableFetchError("429 forever")
            return b"ok"
        return t

    st = FetchStage(make_transport=make_transport, sleep=lambda s: None)
    out = st(_urls("good", "bad", "good2"))
    assert out["status"].to_pylist() == ["ok", "failed", "ok"]
    assert out["attempts"].to_pylist() == [1, 3, 1]
    assert "retries exhausted" in out["error"].to_pylist()[1]
    assert out["payload"].to_pylist()[0] == b"ok"


def test_permanent_error_fails_fast():
    def make_transport():
        def t(url):
            raise KeyError("no such host")
        return t

    slept = []
    st = FetchStage(make_transport=make_transport, sleep=slept.append)
    out = st(_urls("x"))
    assert out["status"].to_pylist() == ["failed"]
    assert out["attempts"].to_pylist() == [1]  # no retry on permanent error
    assert slept == []
    assert "KeyError" in out["error"].to_pylist()[0]


def test_default_transport_refuses_clearly():
    st = FetchStage()
    out = st(_urls("http://example.com"))
    assert out["status"].to_pylist() == ["failed"]
    assert "NotImplementedError" in out["error"].to_pylist()[0]


def test_fetch_in_ray_pipeline_with_dead_letter_split(ray_session):
    import ray.data as rd

    def make_transport():
        def t(url):
            if url == "u7":
                raise RetryableFetchError("429")
            return url.encode()
        return t

    ds = rd.from_arrow(_urls(*[f"u{i}" for i in range(20)])).map_batches(
        FetchStage, batch_format="pyarrow", batch_size=5,
        concurrency=(1, 2),
        fn_constructor_kwargs={"make_transport": make_transport,
                               "sleep": lambda s: None})
    ok, failed = split_dead_letters(ds)
    okp, failp = ok.to_pandas(), failed.to_pandas()
    assert len(okp) == 19 and len(failp) == 1
    assert failp["url"].tolist() == ["u7"]
    assert (okp["payload"] == okp["url"].str.encode("utf-8")).all()
