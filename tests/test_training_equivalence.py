"""Training-equivalence study vs the ACTUAL reference trainer (VERDICT r2
item 1): the only offline evidence that the ±0.2-R@1 north star is likely
met. Two levels:

1. STEP equivalence (the sharp tool): identical initial weights (exported
   by the reference, imported through our torch-import pipeline), identical
   batches (recorded from the reference's own DataLoader), dropout off —
   per-step losses from the reference's train step (model/model.py:964-1001)
   and ours must track to float-accumulation noise across two epochs. This
   isolates the update rule: adam eps placement, global-norm clipping, BN
   batch-stats flow, loss formula.

2. TRAJECTORY equivalence (the basin check): both full trainers run their
   own init/shuffle/dropout on the same world with matched hyperparameters;
   both must learn (loss drops, retrieval far above chance). Bands are wide
   because a 48-video world has real seed variance (reference itself spans
   mir 0.51-0.68 over seeds at 30 epochs).

Reference side runs in torch-only subprocesses (shell/ref_train_driver.py,
shell/ref_step_driver.py); skipped when the reference tree is absent.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/model"), reason="reference tree absent"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "shell"))


@pytest.fixture(scope="module")
def equiv_world(tmp_path_factory):
    from train_equivalence import build_world

    root = str(tmp_path_factory.mktemp("equivworld"))
    build_world(root, n_train=32, n_val=16)
    return root


def test_step_equivalence_identical_losses(equiv_world):
    """Matched init + matched batches + no dropout => per-step loss parity
    through 2 epochs (BN stats and adam moments evolving on both sides)."""
    from train_equivalence import run_ours_steps

    root = equiv_world
    out = os.path.join(root, "ref_steps.json")
    state = os.path.join(root, "ref_init.pth.tar")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "shell", "ref_step_driver.py"),
         "--rootpath", root, "--train", "equivtrain", "--epochs", "2",
         "--batch_size", "16", "--lr", "2e-3", "--out", out,
         "--state_out", state],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu", CUDA_VISIBLE_DEVICES=""),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    ref = json.load(open(out))
    ours = run_ours_steps(root, ref, state, 2e-3, 2)

    ref_losses = np.asarray(ref["losses"])
    our_losses = np.asarray(ours)
    assert ref_losses.shape == our_losses.shape
    # float32 forward/backward in two frameworks: agreement to ~1e-4
    # relative per step in a quiet process (measured 0-5e-5). XLA CPU
    # reduction tiling shifts with host load (see the verify skill), so the
    # band leaves room for concurrent-suite jitter; a real dynamics
    # mismatch (wrong eps/clip/BN flow) diverges by whole loss units
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-2, atol=1e-1)


def test_trainer_trajectory_same_basin(equiv_world):
    """Both full trainers (their own init/shuffle/dropout) learn the world:
    loss drops substantially and retrieval lands far above chance in a
    matched epoch budget."""
    from train_equivalence import (
        compare, epoch_mean_loss, run_ours, run_reference,
    )

    root = equiv_world
    epochs = 10
    ref = run_reference(root, epochs, 16, 2e-3, 2)
    ours = run_ours(root, epochs, 16, 2e-3, 2)
    report = compare(ref, ours)

    # both must learn: loss down >=15% in 10 epochs on this world
    assert report["ref_loss_drop"] > 0.15, report
    assert report["our_loss_drop"] > 0.15, report
    # both far above chance (random mir on a 16-video gallery ~= 0.21)
    chance_mir = float(np.mean(1.0 / (1 + np.arange(16))))
    assert report["ref_best_mir"] > chance_mir + 0.1, report
    assert report["our_best_mir"] > chance_mir + 0.1, report
    # same basin: the across-seed spread of the reference itself at this
    # world size is ~0.17 mir; require the frameworks to land within it
    assert report["mir_abs_diff"] < 0.2, report
