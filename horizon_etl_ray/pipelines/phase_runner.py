"""Subprocess entry for ``PhaseSpec(isolate=True)`` callable phases.

The orchestrator serializes the phase callable with cloudpickle (closures
and lambdas included — stdlib pickle would reject them) to a temp file and
launches ``python -m horizon_etl_ray.pipelines.phase_runner <path>`` through
its argv machinery, so an isolated callable gets the SAME hard guarantees as
any reference phase (`/root/reference/src/flows/pipelines/
weekly_orchestrator.py:1-29` runs every phase as a subprocess): its own
process group, SIGKILL on timeout (no straggler thread), and kill-and-retry
semantics. An isolated phase must own whatever Ray usage it needs — it does
NOT share the caller's Ray session.

Exit code 0 on success; any exception propagates (exit 1) with the
traceback on stderr for the orchestrator's error capture.
"""

from __future__ import annotations

import os
import sys


def main(path: str) -> None:
    # the orchestrator launches this file BY PATH (no package import needed
    # to start), but the pickled callable may reference repo modules — make
    # the package root importable before unpickling, independent of the
    # caller's PYTHONPATH
    root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    from ray import cloudpickle

    with open(path, "rb") as f:
        fn = cloudpickle.load(f)
    fn()


if __name__ == "__main__":
    main(sys.argv[1])
