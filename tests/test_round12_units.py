"""Round-12 units: the bench/sweep pidfile handshake (tools/busy.py) —
the round-11 BENCH artifact was contaminated by a co-resident sweep with
no way to tell from the record; these pin the guard that prevents it.
"""
import os
import subprocess
import sys
from pathlib import Path

TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))

import busy  # noqa: E402


def test_claim_creates_and_live_sees_other_process(tmp_path, monkeypatch):
    monkeypatch.setattr(busy, "PID_DIR", tmp_path)
    # A live claimant from ANOTHER process: spawn a child that claims
    # and sleeps; live() in this process must report it.
    code = (
        "import sys, time; sys.path.insert(0, sys.argv[1]); import busy; "
        "busy.PID_DIR = __import__('pathlib').Path(sys.argv[2]); "
        "busy.claim('t'); print('claimed', flush=True); time.sleep(30)"
    )
    child = subprocess.Popen(
        [sys.executable, "-c", code, str(TOOLS), str(tmp_path)],
        stdout=subprocess.PIPE, text=True,
    )
    try:
        assert child.stdout.readline().strip() == "claimed"
        hits = busy.live()
        assert len(hits) == 1 and f"pid {child.pid}" in hits[0]
    finally:
        child.kill()
        child.wait()
    # Claimant dead -> stale file pruned on the next look.
    assert busy.live() == []
    assert list(tmp_path.glob("busy_*.pid")) == []


def test_live_ignores_own_process_and_garbage(tmp_path, monkeypatch):
    monkeypatch.setattr(busy, "PID_DIR", tmp_path)
    busy.claim("self")
    (tmp_path / "busy_garbage_notanint.pid").write_text("x\n")
    assert busy.live() == []  # own claim excluded, garbage pruned
    assert not (tmp_path / "busy_garbage_notanint.pid").exists()
    # own pidfile still present for OTHER processes to see
    assert len(list(tmp_path.glob(f"busy_self_{os.getpid()}.pid"))) == 1


def test_bench_refuses_on_live_pidfile(tmp_path):
    """bench.py must exit 4 with a self-identifying JSON error while a
    claimant is alive (unless SPARK_GRAFT_BENCH_FORCE=1)."""
    code = (
        "import sys, time; sys.path.insert(0, sys.argv[1]); import busy; "
        "busy.claim('t'); print('claimed', flush=True); time.sleep(60)"
    )
    child = subprocess.Popen(
        [sys.executable, "-c", code, str(TOOLS)], stdout=subprocess.PIPE, text=True
    )
    try:
        assert child.stdout.readline().strip() == "claimed"
        env = {**os.environ, "SPARK_GRAFT_BENCH_FORCE": "0"}
        r = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, '/root/repo'); "
             "import bench; bench._box_state()"],
            capture_output=True, text=True, env=env, timeout=60,
        )
        assert r.returncode == 4, r.stdout + r.stderr
        assert "refusing to bench" in r.stdout
    finally:
        child.kill()
        child.wait()
        import busy as b
        b.live()  # prune the dead child's pidfile from the real dir
