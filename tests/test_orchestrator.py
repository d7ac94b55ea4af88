"""Phase-orchestration driver: timeout / critical / resume / notifier
semantics (reference: weekly_orchestrator.py — see orchestrator.py docstring
for the deliberate differences)."""

import sys

import pytest

from horizon_etl_ray.pipelines.orchestrator import (CallbackNotifier,
                                                    Orchestrator, PhaseSpec,
                                                    run_phases)


def _spec(name, fn, critical=False, timeout=30.0, retries=0):
    return PhaseSpec(name=name, run=fn, timeout_sec=timeout,
                     critical=critical, retries=retries)


def test_noncritical_failure_degrades_run():
    """A failing non-critical phase does not stop later phases and the run
    exits 0 (reference policy: degraded, not failed)."""
    ran = []

    def boom():
        raise RuntimeError("source down")

    rc, results = run_phases([
        _spec("a", lambda: ran.append("a")),
        _spec("b", boom, critical=False),
        _spec("c", lambda: ran.append("c")),
    ])
    assert rc == 0
    assert ran == ["a", "c"]
    by = {r.name: r for r in results}
    assert by["b"].status == "failed" and not by["b"].ok
    assert "source down" in by["b"].error
    assert by["c"].status == "ran"


def test_critical_failure_halts_and_fails():
    ran = []

    def boom():
        raise RuntimeError("no export")

    rc, results = run_phases([
        _spec("a", lambda: ran.append("a")),
        _spec("b", boom, critical=True),
        _spec("c", lambda: ran.append("c")),
    ])
    assert rc == 1
    assert ran == ["a"]  # c never ran
    by = {r.name: r for r in results}
    assert by["b"].status == "failed" and by["c"].status == "halted"


def test_continue_on_critical_matches_reference():
    """Reference-parity mode: run everything, exit non-zero at the end."""
    ran = []

    def boom():
        raise RuntimeError("x")

    rc, results = run_phases(
        [_spec("b", boom, critical=True), _spec("c", lambda: ran.append("c"))],
        continue_on_critical=True,
    )
    assert rc == 1 and ran == ["c"]


def test_rerun_resumes_from_checkpoint(tmp_path):
    """Succeeded phases are skipped on rerun; the failed one re-executes."""
    state = str(tmp_path / "state")
    calls = {"a": 0, "b": 0, "c": 0}
    flaky_ok = {"on": False}

    def mk(name):
        def fn():
            calls[name] += 1
            if name == "b" and not flaky_ok["on"]:
                raise RuntimeError("flaky")
        return fn

    plan = [_spec("a", mk("a")), _spec("b", mk("b"), critical=True),
            _spec("c", mk("c"))]
    rc1, r1 = run_phases(plan, state_dir=state)
    assert rc1 == 1 and calls == {"a": 1, "b": 1, "c": 0}
    flaky_ok["on"] = True
    rc2, r2 = run_phases(plan, state_dir=state)
    assert rc2 == 0
    assert calls == {"a": 1, "b": 2, "c": 1}  # a skipped, b retried, c ran
    by = {r.name: r for r in r2}
    assert by["a"].status == "skipped" and by["b"].status == "ran"


def test_callable_timeout_recorded_and_run_continues():
    import time as _t

    rc, results = run_phases([
        _spec("slow", lambda: _t.sleep(5), timeout=0.2),
        _spec("after", lambda: None),
    ])
    by = {r.name: r for r in results}
    assert by["slow"].status == "timeout" and not by["slow"].ok
    assert by["after"].status == "ran"
    assert rc == 0  # non-critical timeout degrades


def test_subprocess_phase_killed_on_timeout_and_rc_captured():
    ok = PhaseSpec(name="true", run=[sys.executable, "-c", "pass"],
                   timeout_sec=30)
    bad = PhaseSpec(name="bad", run=[sys.executable, "-c", "raise SystemExit(3)"],
                    timeout_sec=30)
    hang = PhaseSpec(name="hang",
                     run=[sys.executable, "-c", "import time; time.sleep(60)"],
                     timeout_sec=0.5, critical=True)
    rc, results = run_phases([ok, bad, hang])
    by = {r.name: r for r in results}
    assert by["true"].ok and by["true"].rc == 0
    assert by["bad"].status == "failed" and by["bad"].rc == 3
    assert by["hang"].status == "timeout"
    assert rc == 1


def test_retries_reattempt_before_failing():
    n = {"tries": 0}

    def flaky():
        n["tries"] += 1
        if n["tries"] < 3:
            raise RuntimeError("again")

    rc, results = run_phases([_spec("f", flaky, retries=2)])
    assert rc == 0 and results[0].attempts == 3 and results[0].ok


def test_failure_notifier_fires_exactly_once_and_never_alters_outcome():
    failures, phases_seen, completed = [], [], []

    def boom():
        raise RuntimeError("x")

    notifier = CallbackNotifier(
        on_phase_end=lambda r: phases_seen.append(r.name),
        on_failure=lambda r: failures.append(r.name),
        on_complete=lambda rs, rc: completed.append(rc),
    )
    rc, _ = run_phases(
        [_spec("a", lambda: None), _spec("b", boom)], notifier=notifier)
    assert failures == ["b"]
    assert phases_seen == ["a", "b"]
    assert completed == [rc]

    class Exploding(CallbackNotifier):
        def on_failure(self, result):
            raise RuntimeError("transport down")

        def on_phase_end(self, result):
            raise RuntimeError("transport down")

        def on_complete(self, results, rc):
            raise RuntimeError("transport down")

    rc2, results2 = run_phases(
        [_spec("a", lambda: None), _spec("b", boom)], notifier=Exploding())
    assert rc2 == 0 and {r.name: r.ok for r in results2} == {
        "a": True, "b": False}


def test_successful_run_clears_checkpoint_so_next_run_executes(tmp_path):
    """The checkpoint is a failure-resume record, not a was-ever-run record:
    after a fully-green run the next invocation of the same plan (next
    week's driver over new epochs) must execute fresh, not skip forever."""
    import os

    state = str(tmp_path / "state")
    calls = {"a": 0, "b": 0}
    plan = [_spec("a", lambda: calls.__setitem__("a", calls["a"] + 1)),
            _spec("b", lambda: calls.__setitem__("b", calls["b"] + 1),
                  critical=True)]
    rc1, _ = run_phases(plan, state_dir=state)
    assert rc1 == 0 and calls == {"a": 1, "b": 1}
    assert not os.path.exists(os.path.join(state, "phases.json"))
    rc2, r2 = run_phases(plan, state_dir=state)
    assert rc2 == 0 and calls == {"a": 2, "b": 2}
    assert all(r.status == "ran" for r in r2)


def test_timed_out_callable_not_retried():
    """A timed-out callable phase leaves its straggler thread running —
    retrying would start a second concurrent execution against the same
    state. Only argv phases (killed for real) are retryable after timeout."""
    import time as _t

    n = {"starts": 0}

    def slow():
        n["starts"] += 1
        _t.sleep(5)

    rc, results = run_phases([_spec("slow", slow, timeout=0.2, retries=3)])
    assert results[0].status == "timeout"
    assert results[0].attempts == 1
    assert n["starts"] == 1
    assert "straggler" in results[0].error


def test_subprocess_timeout_kills_whole_process_tree(tmp_path):
    """An argv phase that spawns a grandchild: the timeout must kill the
    whole process group, not just the direct child — a surviving grandchild
    would race the next phase (e.g. a replay still committing during
    compact)."""
    import os
    import time as _t

    pid_file = str(tmp_path / "grandchild.pid")
    child_src = (
        "import subprocess, sys, time\n"
        f"p = subprocess.Popen([sys.executable, '-c', "
        f"'import time; time.sleep(60)'])\n"
        f"open({pid_file!r}, 'w').write(str(p.pid))\n"
        "time.sleep(60)\n"
    )
    rc, results = run_phases([
        PhaseSpec(name="spawner", run=[sys.executable, "-c", child_src],
                  timeout_sec=2.0),
    ])
    assert results[0].status == "timeout"
    gpid = int(open(pid_file).read())
    # the grandchild must be dead (or a reaped zombie) shortly after
    deadline = _t.time() + 5
    alive = True
    while _t.time() < deadline:
        try:
            os.kill(gpid, 0)
        except ProcessLookupError:
            alive = False
            break
        # may still be an unreaped zombie of *our* session — check state
        try:
            with open(f"/proc/{gpid}/stat") as f:
                if f.read().split(")")[-1].split()[0] == "Z":
                    alive = False
                    break
        except FileNotFoundError:
            alive = False
            break
        _t.sleep(0.1)
    assert not alive, f"grandchild {gpid} survived the group kill"


def test_duplicate_phase_names_rejected():
    with pytest.raises(ValueError):
        Orchestrator([_spec("x", lambda: None), _spec("x", lambda: None)])


def test_isolated_callable_killed_on_timeout(tmp_path):
    """PhaseSpec(isolate=True): a hanging CALLABLE is argv-wrapped through
    phase_runner and killed for real on timeout (the watchdog path can only
    record it) — the run degrades/halts per criticality and returns fast."""
    import time as _time

    marker = tmp_path / "started"

    def hang():
        open(str(marker), "w").write("x")
        _time.sleep(60)

    t0 = _time.time()
    rc, results = run_phases([
        PhaseSpec("hang", hang, timeout_sec=1.5, critical=True,
                  isolate=True),
        PhaseSpec("after", lambda: None),
    ])
    assert _time.time() - t0 < 20  # killed, not joined for 60s
    assert rc == 1
    assert results[0].status == "timeout" and not results[0].ok
    assert results[1].status == "halted"
    assert marker.exists()  # the child really started before the kill


def test_isolated_callable_success_and_error_capture(tmp_path):
    out = tmp_path / "out.txt"

    def ok():
        open(str(out), "w").write("done")

    def boom():
        raise RuntimeError("isolated kaboom")

    rc, results = run_phases([
        PhaseSpec("ok", ok, timeout_sec=30, isolate=True),
        PhaseSpec("boom", boom, timeout_sec=30, isolate=True),
    ])
    assert rc == 0  # boom is non-critical → degraded run
    assert results[0].ok and out.read_text() == "done"
    assert not results[1].ok and "isolated kaboom" in (results[1].error or "")


def test_isolated_timeout_is_retryable(tmp_path):
    """Unlike the watchdog path (straggler thread → no retry), an isolated
    timeout killed the work for real, so retries re-attempt; a marker file
    makes the second attempt succeed fast."""
    import time as _time

    marker = tmp_path / "attempt"

    def flaky():
        if marker.exists():
            return
        open(str(marker), "w").write("x")
        _time.sleep(60)

    rc, results = run_phases([
        PhaseSpec("flaky", flaky, timeout_sec=2.0, retries=1, isolate=True),
    ])
    assert rc == 0
    assert results[0].ok and results[0].attempts == 2
