"""Simulated multi-host (DCN) smoke: 2 CPU processes x 2 virtual devices
running the sharded similarity engine and a dp-sharded gradient psum via
jax.distributed + Gloo (VERDICT r2 item 9; no pod hardware here)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_multihost_smoke():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "shell", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=300,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "MULTIHOST-OK proc=0" in out and "MULTIHOST-OK proc=1" in out, out
    assert "multihost smoke: PASS" in out, out


def test_two_process_full_trainer(tmp_path):
    """FULL trainer.main across 2 Gloo processes (VERDICT r3 item 6):
    feeds, HBM caches, dp=4 GSPMD train steps, validation, and the
    process-0-only checkpoint dance — metrics match the single-process
    run on the same 4-device mesh (asserted inside the driver)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "shell", "multihost_smoke.py"),
         "--trainer"],
        capture_output=True, text=True, timeout=900,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "multihost trainer smoke: PASS" in out, out


def test_two_process_resume_divergence_guard(tmp_path):
    """--resume across 2 processes where only process 0 can see the
    resume checkpoint (per-process roots simulate a non-shared
    filesystem): every process must refuse the run with the
    shared-filesystem error instead of silently diverging."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "shell", "multihost_smoke.py"),
         "--trainer-resume-split"],
        capture_output=True, text=True, timeout=900,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "multihost resume-guard smoke: PASS" in out, out
