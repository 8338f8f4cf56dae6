"""From-scratch init-distribution regression vs the REAL reference model.

Levels 1-2 of the equivalence study import the reference's init weights and
therefore cannot detect an init-distribution divergence; this test can (it
caught the round-4 w2v-init gate bug: our generalized gate w2v-initialized
the GRU embedding on the 8-dim toy world where the reference — gated on
we_dim==500, model/model.py:334-336 — keeps the N(0,1) nn.Embedding
default, costing ~0.05 mean best mir from scratch).

It subprocess-runs both sides of ``shell/init_distribution_audit.py`` on a
tiny world and asserts zero findings: every trainable parameter matched by
exported torch name, same shapes, per-parameter init std within a
sample-size-adaptive tolerance.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/model"), reason="reference tree absent"
)


def test_init_distributions_match_reference(tmp_path):
    from helpers import build_collection, build_w2v

    root = str(tmp_path)
    build_collection(root, "equivtrain", n_videos=12, caps_per_video=2, seed=0)
    build_collection(root, "equivval", n_videos=6, caps_per_video=1, seed=100)
    build_w2v(root)
    # the reference hardcodes this w2v path (trainer.py:190)
    ref_w2v = os.path.join(root, "word2vec", "flickr", "vec500flickr30m")
    os.makedirs(os.path.dirname(ref_w2v), exist_ok=True)
    if not os.path.isdir(ref_w2v):
        import shutil

        shutil.copytree(os.path.join(root, "word2vec", "toy"), ref_w2v)

    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "shell", "init_distribution_audit.py"),
         "--root", root, "--seeds", "2"],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu", CUDA_VISIBLE_DEVICES=""),
    )
    assert r.returncode == 0, (
        f"init-distribution audit found mismatches:\n{r.stdout[-3000:]}\n"
        f"{r.stderr[-1500:]}"
    )
    assert "findings: 0" in r.stdout
