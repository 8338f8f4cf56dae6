"""The headline bench (bench.py) must emit exactly one parseable JSON
line on EVERY exit path — the round-4 capture recorded rc=124 with no
line when the backend wedged, which is the failure mode these tests pin.

All tests stub the device phases; nothing here touches a TPU.
"""

import importlib.util
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _last_json_line(out):
    lines = [l for l in out.strip().splitlines() if l.strip().startswith("{")]
    assert lines, f"no JSON line in output: {out!r}"
    return json.loads(lines[-1])


def test_backend_unavailable_prints_structured_line(capsys):
    bench = _load_bench()
    bench.wait_for_backend = lambda *a, **k: (False, True)
    bench._run_phase = lambda flag, timeout_s: (
        ({"ref_qps": 1000.0}, None) if flag == "--_ref" else (None, "x")
    )
    bench.main()
    d = _last_json_line(capsys.readouterr().out)
    assert d["error"] == "backend_unavailable"
    assert d["value"] is None and d["metric"].startswith("mvtest3k")


def test_flat_timeout_cascade_guards_pallas(capsys):
    bench = _load_bench()
    bench.wait_for_backend = lambda *a, **k: (True, False)
    calls = []

    def phases(flag, timeout_s):
        calls.append(flag)
        if flag == "--_ref":
            return {"ref_qps": 1000.0}, None
        if flag == "--_kernel=xla_flat_count":
            return None, f"timeout after {timeout_s}s"
        raise AssertionError(f"must not run {flag} after a flat timeout")

    bench._run_phase = phases
    bench.main()
    d = _last_json_line(capsys.readouterr().out)
    assert d["error"] == "all_kernels_failed"
    assert "skipped" in d["detail"]["pallas_fused"]
    assert "--_kernel=pallas_fused" not in calls


def test_slow_flat_phase_skips_pallas(capsys):
    bench = _load_bench()
    bench.wait_for_backend = lambda *a, **k: (True, False)

    def phases(flag, timeout_s):
        if flag == "--_ref":
            return {"ref_qps": 1000.0}, None
        if flag == "--_kernel=xla_flat_count":
            time.sleep(0)  # simulate duration via patched clock below
            return {"name": "xla_flat_count", "wall_s": 0.05,
                    "device_s": 0.01, "wall_qps": 1.0e6}, None
        if flag == "--_rtt":
            return {"rtt_s": 0.03}, None
        raise AssertionError(f"must not run {flag} on a slow night")

    bench._run_phase = phases
    # fake a 250s flat phase: monkeypatch time.time used inside main
    real_time = time.time
    ticks = iter([0.0, 250.0])
    bench.time.time = lambda: next(ticks, real_time())
    try:
        bench.main()
    finally:
        bench.time.time = real_time
    d = _last_json_line(capsys.readouterr().out)
    assert d["value"] is not None
    assert "skipped" in d["kernel_errors"]["pallas_fused"]


def test_success_path_reports_device_headline(capsys):
    bench = _load_bench()
    bench.wait_for_backend = lambda *a, **k: (True, False)

    def phases(flag, timeout_s):
        if flag == "--_ref":
            return {"ref_qps": 2000.0}, None
        if flag == "--_kernel=xla_flat_count":
            return {"name": "xla_flat_count", "wall_s": 0.05,
                    "device_s": 0.0086, "wall_qps": bench.T / 0.05}, None
        if flag == "--_kernel=pallas_fused":
            return {"name": "pallas_fused", "wall_s": 0.08,
                    "device_s": 0.02, "wall_qps": bench.T / 0.08}, None
        if flag == "--_rtt":
            return {"rtt_s": 0.03}, None
        raise AssertionError(flag)

    bench._run_phase = phases
    bench.main()
    d = _last_json_line(capsys.readouterr().out)
    assert d["path"] == "xla_flat_count"
    assert d["value"] == round(bench.T / 0.0086, 1)
    assert d["vs_baseline"] == round(bench.T / 0.0086 / 2000.0, 2)
    assert 0 < d["mfu"] < 1.2


def test_sigterm_mid_run_still_emits_json_line():
    """An external kill (the driver's timeout) must leave a parseable
    line on stdout — subprocess-level test of the SIGTERM handler."""
    child = subprocess.Popen(
        [sys.executable, "-c", (
            "import sys; sys.path.insert(0, %r)\n"
            "import importlib.util\n"
            "spec = importlib.util.spec_from_file_location('b', %r)\n"
            "b = importlib.util.module_from_spec(spec)\n"
            "spec.loader.exec_module(b)\n"
            "import time\n"
            "b.wait_for_backend = lambda *a, **k: (time.sleep(600), (True, False))[1]\n"
            "b.main()\n"
        ) % (REPO, os.path.join(REPO, "bench.py"))],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    time.sleep(3)
    child.send_signal(signal.SIGTERM)
    out, _ = child.communicate(timeout=30)
    d = _last_json_line(out)
    assert d["error"] == "killed_externally"
