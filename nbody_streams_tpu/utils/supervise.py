"""Supervised on-chip execution: hard timeout + retry in a fresh process.

The axon TPU tunnel can wedge mid-run: a dispatched computation simply
never returns while the chip stays otherwise healthy (observed
repeatedly — a capacity probe sat >14 min; a round-4 judge smoke run
hung >25 min before a clean 9.5-min rerun).  A wedge inside any
unsupervised on-chip entry point silently eats its whole slot, so every
long-running driver-facing script (bench.py, benchmarks/*, the TPU
smoke tier, long examples) should run its measurement in a child the
supervisor can kill.  A fresh process re-establishes the tunnel
connection, which is exactly what recovered every observed wedge, so
one retry is the fix — not a workaround.

Usage, in a script whose ``main()`` touches the chip::

    from nbody_streams_tpu.utils.supervise import supervised

    if __name__ == "__main__":
        if "--child" in sys.argv:
            sys.exit(main() or 0)
        sys.exit(supervised([sys.executable, __file__, "--child"]))

The child's stdout passes through only on success (so a driver that
parses the output never sees a half-written line from a killed
attempt); stderr streams live.  bench.py carries its own copy of this
pattern (it must stay runnable standalone) — keep the two in sync.
"""
from __future__ import annotations

import os
import signal
import subprocess
import sys

__all__ = ["supervised", "resupervise"]


def resupervise(script_path: str, timeout_s: float | None = None,
                retries: int = 1) -> None:
    """One-line guard for a script's ``__main__`` block.

    In the supervised child (``--child`` in argv) this strips the flag
    and returns, letting the script body run.  Otherwise it re-runs the
    script as a supervised child with the same arguments and exits with
    the child's code — so a wedged dispatch is killed and retried in a
    fresh process instead of hanging the caller forever::

        if __name__ == "__main__":
            resupervise(__file__)
            main()
    """
    if "--child" in sys.argv:
        sys.argv.remove("--child")
        return
    sys.exit(supervised(
        [sys.executable, os.path.abspath(script_path), "--child"]
        + sys.argv[1:], timeout_s=timeout_s, retries=retries))


def supervised(child_cmd, timeout_s: float | None = None,
               retries: int = 1, env_var: str = "NBODY_RUN_TIMEOUT_S",
               default_timeout_s: float = 1800.0) -> int:
    """Run ``child_cmd`` with a hard timeout and ``retries`` fresh-process
    retries; return the exit code (124 if every attempt timed out).

    ``timeout_s`` defaults to ``$NBODY_RUN_TIMEOUT_S`` or
    ``default_timeout_s``.  The child runs in its own session so a kill
    reaps its whole process group (the wedged dispatch thread included).
    """
    if timeout_s is None:
        timeout_s = float(os.environ.get(env_var, str(default_timeout_s)))
    attempts = retries + 1
    for attempt in range(1, attempts + 1):
        child = subprocess.Popen(child_cmd, stdout=subprocess.PIPE,
                                 text=True, start_new_session=True)
        try:
            out, _ = child.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            print(f"supervise: attempt {attempt} exceeded {timeout_s:.0f}s "
                  "(TPU tunnel wedge?) — killing child"
                  + ("" if attempt == attempts else ", retrying"),
                  file=sys.stderr, flush=True)
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            child.wait()
            continue
        if out:
            sys.stdout.write(out)
            sys.stdout.flush()
        if child.returncode == 0:
            return 0
        print(f"supervise: attempt {attempt} exited rc={child.returncode}"
              + ("" if attempt == attempts else " — retrying"),
              file=sys.stderr, flush=True)
        if attempt == attempts:
            return child.returncode
    return 124
