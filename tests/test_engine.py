"""End-to-end engine test: prepare -> train -> validate -> checkpoint on a
synthetic collection (the 'minimum end-to-end slice' milestone)."""

import os

import numpy as np
import pytest

from laff_tpu.engine import Options, load_config, prepare
from laff_tpu.engine.checkpoint import load_checkpoint
from laff_tpu.engine.trainer import LRController, main

from helpers import build_collection, build_w2v


@pytest.fixture
def tiny_world(tmp_path):
    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=32, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=16, caps_per_video=1, seed=5)
    build_w2v(root)
    return root


def make_opt(root, **kw):
    defaults = dict(
        trainCollection="toytrain",
        valCollection="toyval",
        rootpath=root,
        val_set="no",
        config_name="tiny",
        num_epochs=3,
        batch_size=16,
        model_prefix="run_test",
        metric="mir",
        random_seed=2,
    )
    defaults.update(kw)
    return Options(**defaults)


def test_prepare_builds_spec_and_feeds(tiny_world):
    opt = make_opt(tiny_world)
    prepared = prepare(opt)
    spec = prepared.spec
    assert dict(spec.vis.features) == {"clip_ft": 16, "x3d": 12}
    txt_feats = dict(spec.txt.features)
    assert set(txt_feats) == {"rnn", "bow", "w2v"}
    assert txt_feats["w2v"] == 8
    assert spec.txt.gru is not None and spec.txt.gru.pooling == "mean"
    assert prepared.we is not None  # w2v-initialized embedding matrix
    # vocab auto-built and persisted
    assert os.path.exists(
        os.path.join(tiny_world, "toytrain", "TextData", "vocab", "bow_nsw_1.pkl")
    )
    batch = next(iter(prepared.train_feed.epoch(0)))
    assert batch["txt"]["bow"].shape[0] == 16
    assert batch["vis"]["clip_ft"].shape == (16, 16)


def test_train_end_to_end(tiny_world):
    opt = make_opt(tiny_world, num_epochs=10)
    result = main(opt)
    model_path = result["model_path"]
    # training actually learned something on the aligned synthetic data
    # (random-baseline mir for a 16-item gallery is ~0.21)
    assert result["best_perf"] > 0.25, result
    # checkpoint protocol artifacts
    assert os.path.exists(os.path.join(model_path, "model_best.pth.tar"))
    assert os.path.exists(os.path.join(model_path, "val_perf_hist.txt"))
    assert os.path.exists(os.path.join(model_path, "val_perf.txt"))
    assert not os.path.exists(os.path.join(model_path, "model_temp_best.pth.tar"))

    ckpt = load_checkpoint(os.path.join(model_path, "model_best.pth.tar"))
    assert ckpt["best_perf"] == pytest.approx(result["best_perf"])
    assert "params" in ckpt and "config" in ckpt and "spec" in ckpt

    # warm start from the checkpoint (pretrained_file_path path)
    opt2 = make_opt(
        tiny_world, num_epochs=1, model_prefix="run_warm",
        pretrained_file_path=os.path.join(model_path, "model_best.pth.tar"),
    )
    result2 = main(opt2)
    assert result2["best_perf"] > 0.2


def test_lr_controller_matches_torch_semantics():
    ctl = LRController(base_lr=1.0, gamma=0.5, plateau_factor=0.5, patience=2)
    assert ctl.current() == 1.0
    ctl.step(1.0)  # epoch 0 -> improvement
    assert ctl.current() == 0.5  # gamma decay
    ctl.step(0.5)  # no improvement (1)
    ctl.step(0.5)  # no improvement (2)
    assert ctl.plateau_scale == 1.0
    ctl.step(0.5)  # no improvement (3) > patience -> halve
    assert ctl.plateau_scale == 0.5
    assert ctl.current() == 1.0 * 0.5**4 * 0.5


def test_frame_laff_end_to_end(tmp_path):
    """FrameLAFF (two-level fusion) trains end to end through prepare ->
    trainer with frame features on disk."""
    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=24, caps_per_video=2, seed=0,
                     frame_feat=True)
    build_collection(root, "toyval", n_videos=12, caps_per_video=1, seed=5,
                     frame_feat=True)
    build_w2v(root)
    # frame features live under FeatureData/frame/<name>
    import shutil

    for coll in ("toytrain", "toyval"):
        src = os.path.join(root, coll, "FeatureData", "clip_frames")
        dst = os.path.join(root, coll, "FeatureData", "frame", "clip_frames")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.move(src, dst)

    opt = make_opt(root, config_name="tiny_frame", num_epochs=3, batch_size=12,
                   model_prefix="run_frame")
    result = main(opt)
    assert result["best_perf"] > 0.2, result
    # checkpoint spec carries the frame features
    ckpt = load_checkpoint(os.path.join(result["model_path"], "model_best.pth.tar"))
    assert dict(ckpt["spec"].vis.frame_features) == {"clip_frames": 16}
