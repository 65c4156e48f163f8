"""bench.py TPU liveness gate (backend_alive).

The gate distinguishes a dead/unreachable device tunnel from a live one
without committing to the 30-min measurement attempts (BENCH_NOTES "TPU
outage" section).  These tests drive the three paths — success, non-zero
exit, and timeout — by swapping the probe interpreter, never touching a
real backend.
"""

import importlib.util
import os
import stat
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_for_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    real = mod.sys.executable
    yield mod
    mod.sys.executable = real


def _fake_interpreter(tmp_path, body):
    p = tmp_path / "fake_python"
    p.write_text(f"#!/bin/bash\n{body}\n")
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(p)


def test_alive_when_probe_prints_smoke_ok(bench, tmp_path):
    bench.sys.executable = _fake_interpreter(tmp_path, "echo SMOKE_OK")
    assert bench.backend_alive(timeout=5, attempts=1) is True


def test_dead_on_nonzero_exit(bench, tmp_path):
    bench.sys.executable = _fake_interpreter(tmp_path, "echo boom >&2; exit 1")
    t0 = time.time()
    assert bench.backend_alive(timeout=5, attempts=2, wait_between=0.1) is False
    assert time.time() - t0 < 5  # fails fast, no timeout burned


def test_dead_on_hang(bench, tmp_path):
    bench.sys.executable = _fake_interpreter(tmp_path, "sleep 30")
    t0 = time.time()
    assert bench.backend_alive(timeout=1, attempts=2, wait_between=0.1) is False
    assert time.time() - t0 < 10  # two 1-s timeouts, not 30-s sleeps


def test_stale_fallback_replays_last_good(bench, tmp_path, capsys, monkeypatch):
    """With the backend down, main() replays the committed last-good record
    marked stale instead of exiting empty-handed."""
    import json

    monkeypatch.setattr(bench, "backend_alive", lambda: False)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["stale"] is True
    assert rec["metric"].startswith("sec_per_generation")
    assert rec["value"] > 0
    assert "measured_at" in rec and rec["measured_at"] in rec["note"]


def test_no_last_good_exits_nonzero(bench, tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "backend_alive", lambda: False)
    monkeypatch.setattr(bench, "LAST_GOOD", str(tmp_path / "absent.json"))
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 2


def test_recovers_on_second_probe(bench, tmp_path):
    marker = tmp_path / "second_try"
    body = (
        f"if [ -f {marker} ]; then echo SMOKE_OK; "
        f"else touch {marker}; exit 1; fi"
    )
    bench.sys.executable = _fake_interpreter(tmp_path, body)
    assert bench.backend_alive(timeout=5, attempts=2, wait_between=0.1) is True
