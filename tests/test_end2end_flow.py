"""End2EndClip training flow: synthetic images on disk -> id.imagepath.txt
-> End2EndFeed -> live-tower training -> validation."""

import os

import numpy as np
import pytest

pytest.importorskip("PIL")

from laff_tpu.engine import Options
from laff_tpu.engine.end2end import main as e2e_main

WORDS = ["red", "green", "blue", "dark", "light", "dog", "cat", "car",
         "tree", "house", "bird", "fish"]


def build_image_world(root, coll, n_videos, caps, seed):
    """Videos are solid-color frame sets; captions name the color — a
    learnable raw-pixel <-> text alignment."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, coll, "frames")
    os.makedirs(img_dir, exist_ok=True)
    id_lines, cap_lines, vids = [], [], []
    for i in range(n_videos):
        vid = f"{coll}_v{i}"
        vids.append(vid)
        color = tuple(int(c) for c in rng.integers(0, 255, 3))
        for f in range(3):
            path = os.path.join(img_dir, f"{vid}_{f}.png")
            arr = np.full((40, 48, 3), color, np.uint8)
            arr += rng.integers(0, 10, arr.shape).astype(np.uint8)
            Image.fromarray(arr).save(path)
            id_lines.append(f"{vid}_{f} {path}")
        color_words = [WORDS[color[0] * len(WORDS) // 256],
                       WORDS[color[1] * len(WORDS) // 256]]
        for c in range(caps):
            cap_lines.append(f"{vid}#{c} a {' '.join(color_words)} video")
    with open(os.path.join(root, coll, "id.imagepath.txt"), "w") as fh:
        fh.write("\n".join(id_lines))
    os.makedirs(os.path.join(root, coll, "TextData"), exist_ok=True)
    with open(os.path.join(root, coll, "TextData", f"{coll}.caption.txt"), "w") as fh:
        fh.write("\n".join(cap_lines))
    os.makedirs(os.path.join(root, coll, "VideoSets"), exist_ok=True)
    with open(os.path.join(root, coll, "VideoSets", f"{coll}.txt"), "w") as fh:
        fh.write("\n".join(vids))


def test_end2end_clip_trains(tmp_path):
    root = str(tmp_path)
    build_image_world(root, "e2etrain", 16, 2, 0)
    build_image_world(root, "e2eval", 8, 1, 5)

    # tiny towers for CPU speed (configs/e2e_tiny.py, picklable)
    opt = Options(
        trainCollection="e2etrain", valCollection="e2eval", rootpath=root,
        val_set="no", config_name="e2e_tiny", num_epochs=2, batch_size=8,
        model_prefix="run_e2e",
    )
    result = e2e_main(opt)

    assert result["best_perf"] > 0
    assert os.path.exists(os.path.join(result["model_path"], "model_best.pth.tar"))


def test_end2end_stage_val_opt_out_matches(tmp_path, monkeypatch):
    """--stage_val_features 0 (documented opt-out, MIGRATING.md) and a
    budget overflow must both fall back to per-epoch lazy streaming on
    the End2EndClip path — same metrics, nothing pinned in host RAM."""
    root = str(tmp_path)
    build_image_world(root, "e2etrain", 12, 2, 0)
    build_image_world(root, "e2eval", 6, 1, 5)

    def run(prefix, stage, budget=None):
        if budget is None:
            monkeypatch.delenv("LAFF_TPU_EVAL_STAGE_BUDGET", raising=False)
        else:
            monkeypatch.setenv("LAFF_TPU_EVAL_STAGE_BUDGET", str(budget))
        opt = Options(
            trainCollection="e2etrain", valCollection="e2eval", rootpath=root,
            val_set="no", config_name="e2e_tiny", num_epochs=1, batch_size=8,
            model_prefix=prefix, stage_val_features=stage,
        )
        return e2e_main(opt)["best_perf"]

    staged = run("run_staged", 1)
    lazy = run("run_lazy", 0)
    overflow = run("run_overflow", 1, budget=1)  # 1 byte: nothing fits
    assert staged == pytest.approx(lazy, abs=1e-6)
    assert staged == pytest.approx(overflow, abs=1e-6)
