"""bench.py's measurement-chain pause: SIGSTOPs every live chainstage
process group before measuring, SIGCONTs them at exit (round 2's driver
bench overlapped a training run and recorded a contaminated number —
VERDICT r2 weak-#1). Pure-host mechanism, no jax involved."""

import importlib.util
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _skip_if_real_bench_or_stage_live():
    """These tests spawn/stop real chainstage process groups and touch the
    shared /tmp pidfiles. If an ACTUAL bench or chain stage is live on this
    host (e.g. the unattended measurement chain), the stage-start hold-off
    in chainstage.sh deadlocks the test and the cleanup below would clobber
    foreign pidfiles — skip instead of interfering."""
    import pytest

    # pidfiles can vanish between glob and read (chainstage.sh rm -f on
    # finish) -> OSError; a recycled PID belonging to an unrelated process
    # must not latch a permanent skip -> match the command line too
    benchpid = Path("/tmp/hyres_bench.pid")
    try:
        pid = int(benchpid.read_text())
        if _stat(pid) and "bench.py" in _args(pid):
            pytest.skip("a real bench.py is live on this host")
    except (ValueError, OSError):
        pass
    for f in Path("/tmp/hyres_chain_stages").glob("*.pid"):
        try:
            pid = int(f.read_text())
            if _stat(pid) and ("chainstage" in _args(pid)
                               or "bench.py" in _args(pid)):
                pytest.skip("a real chain stage is live on this host")
        except (ValueError, OSError):
            pass


def _load_pause():
    spec = importlib.util.spec_from_file_location(
        "benchmod", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._pause_measurement_chain


def _stat(pid: int) -> str:
    return subprocess.run(
        ["ps", "-o", "stat=", "-p", str(pid)],
        capture_output=True, text=True).stdout.strip()


def _args(pid: int) -> str:
    return subprocess.run(
        ["ps", "-o", "args=", "-p", str(pid)],
        capture_output=True, text=True).stdout.strip()


def test_pause_stops_and_atexit_resumes_stages():
    _skip_if_real_bench_or_stage_live()
    stages = []
    try:
        for _ in range(2):
            p = subprocess.Popen(
                ["bash", str(REPO / "scripts/chainstage.sh"),
                 "sleep", "60"])
            stages.append(p)
        time.sleep(1.0)
        pidfiles = sorted(Path("/tmp/hyres_chain_stages").glob("*.pid"))
        # assert only on LIVE stages (ours): a stale pidfile from an
        # externally killed chain stage is skipped by the pause code
        # (ProcessLookupError) and must not fail this test
        pgids = []
        for f in pidfiles:
            pgid = int(f.read_text())
            try:
                os.killpg(pgid, 0)
                pgids.append(pgid)
            except (ProcessLookupError, PermissionError):
                continue
        assert len(pgids) >= 2

        # run the pause in a subprocess so its atexit hook fires for real
        code = (
            "import importlib.util, time\n"
            f"spec = importlib.util.spec_from_file_location('b', "
            f"{str(REPO / 'bench.py')!r})\n"
            "m = importlib.util.module_from_spec(spec)\n"
            "spec.loader.exec_module(m)\n"
            "m._pause_measurement_chain()\n"
            "print('PAUSED', flush=True)\n"
            "time.sleep(2)\n"
        )
        bench = subprocess.Popen([sys.executable, "-c", code],
                                 stdout=subprocess.PIPE, text=True)
        line = bench.stdout.readline().strip()
        assert line == "PAUSED"
        time.sleep(0.5)
        for pgid in pgids:
            assert "T" in _stat(pgid), f"stage {pgid} not stopped"
        bench.wait(timeout=30)
        time.sleep(1.0)
        for pgid in pgids:
            assert "T" not in _stat(pgid), f"stage {pgid} not resumed"
    finally:
        for f in Path("/tmp/hyres_chain_stages").glob("*.pid"):
            try:
                os.killpg(int(f.read_text()), signal.SIGKILL)
            except (ProcessLookupError, ValueError, PermissionError):
                pass
        for p in stages:
            p.wait(timeout=10)


def test_pause_noop_without_stages():
    # no stage dir/pidfiles -> returns without error, registers nothing
    _skip_if_real_bench_or_stage_live()
    for f in Path("/tmp/hyres_chain_stages").glob("*.pid"):
        f.unlink()
    _load_pause()()
