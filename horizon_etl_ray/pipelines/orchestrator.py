"""Multi-phase job orchestration with timeout / criticality semantics.

Re-expresses the reference's weekly pipeline driver
(`/root/reference/src/flows/pipelines/weekly_orchestrator.py:47-90`): a
declared ordered phase list where each phase carries a timeout, a
critical-vs-degradable flag, and an execution mode; a failing non-critical
phase degrades the run (later phases still execute, the summary records the
failure), while a failing critical phase fails the whole run. Differences
from the reference, on purpose:

- **Halt-on-critical is the default.** The reference keeps running after a
  critical failure and only the final exit code reflects it
  (`weekly_orchestrator.py:160-170`); on a Ray cluster the later phases
  would burn hours of cluster time producing artifacts the failed run can
  never publish, so we stop by default and expose
  ``continue_on_critical=True`` for reference-parity behavior.
- **Manifest-based resume.** Phase outcomes are checkpointed to
  ``<state_dir>/phases.json`` with the same atomic write discipline as the
  lake manifest (temp + fsync + rename, `state/manifest.py:42`); re-running
  the same plan skips phases that already succeeded — the reference re-runs
  everything. The checkpoint is a FAILURE-RESUME record only: a run in
  which every phase succeeds deletes it, so the next invocation of the same
  plan (e.g. next week's driver run over new epochs) executes fresh instead
  of silently skipping everything.
- **Phases are callables or argv lists.** Callable phases run in-process
  (they typically drive Ray Data pipelines that share the caller's Ray
  session) on a watchdog thread — a timeout is *recorded* and the run moves
  on, but the straggler thread cannot be preempted (Python threads are not
  killable). ``PhaseSpec(isolate=True)`` closes that gap: the callable is
  cloudpickled and argv-wrapped via ``pipelines/phase_runner`` so it runs
  in its own subprocess with real kill-on-timeout and retry semantics, at
  the cost of not sharing the caller's Ray session. Argv phases run in
  their own subprocess like every reference phase and ARE killed on
  timeout — use them for phases needing hard isolation
  (`scripts/run_replay_job.py` is the ready-made CDC phase entry). Argv
  phases (and isolated callables) start in their own process GROUP and the
  whole group is SIGKILLed on timeout — a phase that spawns children
  (``bash -c``, a replay forking Ray workers) cannot leave grandchildren
  racing the next phase.

Notification hooks mirror the reference's flow-state handlers
(`/root/reference/src/notifications/telegram.py`, wired at
`src/flows/sigpesq/all.py:38`): a :class:`Notifier` receives per-phase and
end-of-run events; notifier errors are swallowed so a broken transport can
never change the run outcome (reference behavior at
`weekly_orchestrator.py:173-176`).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time
from dataclasses import dataclass
from typing import Any, Callable, Sequence

from ..state.manifest import atomic_write_json

__all__ = [
    "PhaseSpec",
    "PhaseResult",
    "Notifier",
    "CallbackNotifier",
    "Orchestrator",
    "run_phases",
]


@dataclass
class PhaseSpec:
    """One declared phase.

    ``run`` is either a zero-arg callable (in-process, watchdog timeout) or
    an argv list (subprocess, killed on timeout). ``critical`` phases fail
    the run; non-critical ones degrade it. ``retries`` re-attempts a failed
    phase before recording the failure (0 = single attempt).
    """

    name: str
    run: Callable[[], Any] | Sequence[str]
    timeout_sec: float = 3600.0
    critical: bool = False
    retries: int = 0
    # isolate=True argv-wraps a CALLABLE phase via pipelines/phase_runner
    # (cloudpickle → subprocess in its own process group), giving it the
    # same kill-on-timeout + retry semantics as an argv phase — closing the
    # documented watchdog gap (in-process threads can't be preempted). The
    # isolated callable must own its Ray usage; it does not share the
    # caller's session. Ignored for argv phases (already isolated).
    isolate: bool = False


@dataclass
class PhaseResult:
    name: str
    status: str  # ran | failed | timeout | skipped | halted
    ok: bool
    critical: bool
    seconds: float = 0.0
    attempts: int = 0
    rc: int | None = None  # subprocess phases only
    error: str | None = None

    def to_json(self) -> dict:
        return {
            "name": self.name, "status": self.status, "ok": self.ok,
            "critical": self.critical, "seconds": round(self.seconds, 3),
            "attempts": self.attempts, "rc": self.rc, "error": self.error,
        }


class Notifier:
    """Pluggable run-lifecycle notification surface (reference:
    `src/notifications/telegram.py` — here a transport-agnostic protocol;
    subclass or use :class:`CallbackNotifier` with any send function).
    Exceptions raised by any hook are swallowed by the orchestrator."""

    def on_phase_end(self, result: PhaseResult) -> None:  # pragma: no cover
        pass

    def on_complete(self, results: list[PhaseResult], rc: int) -> None:  # pragma: no cover
        pass

    def on_failure(self, result: PhaseResult) -> None:  # pragma: no cover
        pass


class CallbackNotifier(Notifier):
    """Adapter turning plain callables into a Notifier — the test transport
    and the simplest production wiring (pass e.g. a webhook poster)."""

    def __init__(self, on_phase_end=None, on_complete=None, on_failure=None):
        self._phase_end = on_phase_end
        self._complete = on_complete
        self._failure = on_failure

    def on_phase_end(self, result: PhaseResult) -> None:
        if self._phase_end:
            self._phase_end(result)

    def on_complete(self, results: list[PhaseResult], rc: int) -> None:
        if self._complete:
            self._complete(results, rc)

    def on_failure(self, result: PhaseResult) -> None:
        if self._failure:
            self._failure(result)


def _run_callable_with_watchdog(fn: Callable[[], Any],
                                timeout: float) -> tuple[bool, str | None]:
    """Run ``fn`` on a daemon thread, wait ``timeout`` seconds. Returns
    (finished_in_time, error). A timed-out thread keeps running detached —
    recorded honestly as a timeout; in-process Python work cannot be
    preempted (use an argv phase for kill-on-timeout semantics)."""
    box: dict[str, Any] = {}

    def target():
        try:
            box["value"] = fn()
        except BaseException as exc:  # noqa: BLE001 - report, don't crash run
            box["error"] = f"{type(exc).__name__}: {exc}"

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        return False, None
    return True, box.get("error")


class Orchestrator:
    def __init__(
        self,
        phases: Sequence[PhaseSpec],
        state_dir: str | None = None,
        halt_on_critical: bool = True,
        notifier: Notifier | None = None,
    ):
        names = [p.name for p in phases]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate phase names: {names}")
        self.phases = list(phases)
        self.state_dir = state_dir
        self.halt_on_critical = halt_on_critical
        self.notifier = notifier or Notifier()

    # -- checkpoint ---------------------------------------------------------
    @property
    def _state_path(self) -> str | None:
        if not self.state_dir:
            return None
        return os.path.join(self.state_dir, "phases.json")

    def _load_done(self) -> dict[str, dict]:
        p = self._state_path
        if not p or not os.path.exists(p):
            return {}
        with open(p) as f:
            recs = json.load(f).get("phases", [])
        return {r["name"]: r for r in recs if r.get("ok")}

    def _checkpoint(self, results: list[PhaseResult]) -> None:
        p = self._state_path
        if not p:
            return
        os.makedirs(self.state_dir, exist_ok=True)
        atomic_write_json(p, {"phases": [r.to_json() for r in results]})

    def _clear_checkpoint(self) -> None:
        p = self._state_path
        if p and os.path.exists(p):
            os.unlink(p)

    # -- notification (never alters the outcome) ----------------------------
    def _notify(self, hook: str, *args) -> None:
        try:
            getattr(self.notifier, hook)(*args)
        except Exception:  # noqa: BLE001
            pass

    # -- execution ----------------------------------------------------------
    def _run_one(self, spec: PhaseSpec) -> PhaseResult:
        attempts = 0
        t0 = time.time()
        status, rc, err = "failed", None, None
        pickle_path = None
        if callable(spec.run) and spec.isolate:
            # argv-wrap the callable (PhaseSpec.isolate): cloudpickle to a
            # temp file + the phase_runner module entry. One file for all
            # attempts; removed in the finally below.
            import tempfile

            from ray import cloudpickle

            fd, pickle_path = tempfile.mkstemp(prefix="horizon_phase_",
                                               suffix=".pkl")
            with os.fdopen(fd, "wb") as f:
                cloudpickle.dump(spec.run, f)
            runner = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "phase_runner.py")
            spec = PhaseSpec(
                name=spec.name,
                run=[sys.executable, runner, pickle_path],
                timeout_sec=spec.timeout_sec, critical=spec.critical,
                retries=spec.retries)
        try:
            return self._run_attempts(spec, attempts, t0, status, rc, err)
        finally:
            if pickle_path:
                try:
                    os.unlink(pickle_path)
                except OSError:
                    pass

    def _run_attempts(self, spec: PhaseSpec, attempts: int, t0: float,
                      status: str, rc, err) -> PhaseResult:
        while attempts <= spec.retries:
            attempts += 1
            if callable(spec.run):
                finished, err = _run_callable_with_watchdog(
                    spec.run, spec.timeout_sec)
                if not finished:
                    status = "timeout"
                    # The straggler thread is STILL RUNNING (Python threads
                    # cannot be preempted) — retrying would start a second
                    # concurrent execution racing it (two writers on one
                    # lake). Record the timeout and stop; only argv phases
                    # (killed for real) are retryable after a timeout.
                    err = ("timed out; straggler thread may still be "
                           "running — not retried (use an argv phase for "
                           "kill-and-retry semantics)")
                    break
                status = "ran" if err is None else "failed"
            else:
                argv = [str(a) for a in spec.run]
                # Own process group so a timeout kills the whole tree —
                # subprocess.run's timeout only kills the direct child,
                # leaving grandchildren (bash -c wrappers, forked workers)
                # racing the next phase.
                proc = subprocess.Popen(
                    argv, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                    text=True, start_new_session=True)
                try:
                    _, stderr = proc.communicate(timeout=spec.timeout_sec)
                    rc = proc.returncode
                    if rc == 0:
                        status, err = "ran", None
                    else:
                        status = "failed"
                        err = (stderr or "").strip()[-500:] or f"exit {rc}"
                except subprocess.TimeoutExpired:
                    try:
                        os.killpg(proc.pid, signal.SIGKILL)
                    except (ProcessLookupError, PermissionError):
                        proc.kill()
                    proc.communicate()  # reap; pipes already closed by kill
                    status, rc, err = "timeout", None, None
            if status == "ran":
                break
        return PhaseResult(
            name=spec.name, status=status, ok=status == "ran",
            critical=spec.critical, seconds=time.time() - t0,
            attempts=attempts, rc=rc, error=err,
        )

    def run(self) -> tuple[int, list[PhaseResult]]:
        """Execute the plan. Returns ``(rc, results)`` — rc 0 when every
        critical phase succeeded (non-critical failures degrade, matching
        reference `weekly_orchestrator.py:180-187`), 1 otherwise."""
        done = self._load_done()
        results: list[PhaseResult] = []
        halted = False
        for spec in self.phases:
            if halted:
                results.append(PhaseResult(
                    name=spec.name, status="halted", ok=False,
                    critical=spec.critical))
                continue
            if spec.name in done:
                prev = done[spec.name]
                results.append(PhaseResult(
                    name=spec.name, status="skipped", ok=True,
                    critical=spec.critical,
                    seconds=0.0, attempts=0, rc=prev.get("rc")))
                continue
            res = self._run_one(spec)
            results.append(res)
            self._checkpoint([r for r in results if r.status != "halted"])
            self._notify("on_phase_end", res)
            if not res.ok:
                self._notify("on_failure", res)
                if spec.critical and self.halt_on_critical:
                    halted = True
        crit_failed = [r for r in results
                       if r.critical and not r.ok and r.status != "halted"]
        rc = 1 if crit_failed else 0
        if all(r.ok for r in results):
            # Fully-successful run: the checkpoint is a failure-resume
            # record, not a was-ever-run record — clear it so the NEXT
            # invocation of this plan (new week, new epochs) runs fresh
            # instead of skipping every phase forever.
            self._clear_checkpoint()
        else:
            self._checkpoint([r for r in results if r.status != "halted"])
        self._notify("on_complete", results, rc)
        return rc, results


def run_phases(
    phases: Sequence[PhaseSpec],
    state_dir: str | None = None,
    halt_on_critical: bool = True,
    continue_on_critical: bool = False,
    notifier: Notifier | None = None,
) -> tuple[int, list[PhaseResult]]:
    """Convenience entry: build and run an :class:`Orchestrator`.
    ``continue_on_critical=True`` restores the reference's run-everything
    behavior (exit code still reflects critical failures)."""
    return Orchestrator(
        phases, state_dir=state_dir,
        halt_on_critical=halt_on_critical and not continue_on_critical,
        notifier=notifier,
    ).run()
