"""Supervised runner for the real-hardware TPU smoke tier.

``NBODY_TEST_TPU=1 pytest -m tpu`` run directly can wedge forever when
the axon tunnel drops a dispatch (observed: a judge smoke run hung
>25 min before a clean 9.5-min rerun).  This wrapper runs the same
pytest invocation in a killable child with a hard timeout and one
fresh-process retry (re-establishing the tunnel connection is exactly
what recovered every observed wedge).

Usage (from the repo root)::

    python tests/run_tpu_smoke.py             # pytest -m tpu, supervised
    python tests/run_tpu_smoke.py tests/test_pallas.py -q

Timeout: ``$NBODY_RUN_TIMEOUT_S`` (default 1800 s — the clean smoke
tier takes ~10 min including compiles).
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nbody_streams_tpu.utils.supervise import supervised  # noqa: E402

if __name__ == "__main__":
    os.environ["NBODY_TEST_TPU"] = "1"
    args = sys.argv[1:] or ["-m", "tpu", "-q"]
    sys.exit(supervised([sys.executable, "-m", "pytest"] + args))
