"""task2 (concept space): inert-by-default parity + the opt-in intent
implementation (Task2Spec; reference task2 loss is dead code,
model/model.py:884 — decision record in COMPONENTS.md)."""

import os

import numpy as np
import pytest

from laff_tpu.engine import Options
from laff_tpu.engine.trainer import main as train_main

from helpers import build_collection, build_w2v


@pytest.fixture
def task2_world(tmp_path):
    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=24, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=12, caps_per_video=1, seed=5)
    build_w2v(root)
    # object-caption file keyed by video id (reference: 'task2 nouns drop
    # the #, so video_id looks up' — data_provider.py:669)
    cap_path = os.path.join(root, "toytrain", "TextData",
                            "toytrain.caption.txt")
    obj_lines = {}
    with open(cap_path) as fh:
        for line in fh:
            cap_id, caption = line.strip().split(" ", 1)
            vid = cap_id.split("#")[0]
            # caption = 'the w1 w2 w3 w4' — objects are the content words
            obj_lines.setdefault(vid, " ".join(caption.split()[1:]))
    with open(os.path.join(root, "toytrain", "TextData",
                           "toytrain.caption.obj.txt"), "w") as fh:
        fh.write("\n".join(f"{v} {w}" for v, w in obj_lines.items()))
    return root


def _opts(root, prefix, **kw):
    return Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny", num_epochs=2, batch_size=12,
        model_prefix=prefix, **kw,
    )


def test_task2_default_is_inert(task2_world):
    """--task2_caption without --task2_intended keeps effective parity with
    the reference's dead code: losses identical to a run with no task2."""
    plain = train_main(_opts(task2_world, "plain"))
    inert = train_main(_opts(task2_world, "inert", task2_caption="obj"))
    np.testing.assert_allclose(
        [e["loss"] for e in inert["history"]],
        [e["loss"] for e in plain["history"]], rtol=1e-6,
    )


def test_task2_intended_trains_and_changes_loss(task2_world):
    plain = train_main(_opts(task2_world, "p2"))
    t2 = train_main(_opts(task2_world, "t2", task2_caption="obj",
                          task2_intended=1))
    assert t2["best_perf"] > 0
    # the auxiliary BCE + concept triplet add a strictly positive term
    assert t2["history"][0]["loss"] > plain["history"][0]["loss"]
    # concept heads exist in the checkpoint and survive a reload
    from laff_tpu.engine.checkpoint import load_checkpoint

    ckpt = load_checkpoint(
        os.path.join(t2["model_path"], "model_best.pth.tar")
    )
    assert "task2_vis_head" in ckpt["params"]
    assert "task2_txt_head" in ckpt["params"]
    assert ckpt["spec"].task2 is not None
    assert ckpt["spec"].task2.n_concepts > 0


def test_task2_cached_epochs_match_fed(task2_world):
    """The concept labels ride the vis batch, so the HBM feature cache must
    reproduce the fed path bit-identically with task2 active."""
    fed = train_main(_opts(task2_world, "fed", task2_caption="obj",
                           task2_intended=1, device_feature_cache=0,
                           device_text_cache=0, steps_per_dispatch=1))
    auto = train_main(_opts(task2_world, "auto", task2_caption="obj",
                            task2_intended=1))
    np.testing.assert_allclose(
        [e["loss"] for e in auto["history"]],
        [e["loss"] for e in fed["history"]], rtol=1e-5,
    )


def test_predict_with_task2_checkpoint(task2_world):
    """A task2-trained checkpoint predicts normally: the concept heads sit
    in the params but inference only drives the retrieval towers."""
    build_collection(task2_world, "toytest", n_videos=12, caps_per_video=1,
                     seed=9)
    t2 = train_main(_opts(task2_world, "t2pred", task2_caption="obj",
                          task2_intended=1))
    from laff_tpu.engine.predictor import PredictOptions, main as predict_main

    popt = PredictOptions(
        testCollection="toytest",
        model_path=os.path.join(t2["model_path"], "model_best.pth.tar"),
        sim_name="t2pred", rootpath=task2_world,
        query_sets="toytest.caption.txt",
        predict_result_file=os.path.join(task2_world, "result_log",
                                         "result_test.txt"),
        batch_size=16,
    )
    results = predict_main(popt)
    res = results["toytest.caption.txt"]
    assert len(res["t2v"]) >= 6  # full metric tuple produced


def test_task2_loss_math():
    """_task2_loss == alpha * (BCE_vis + BCE_txt + hist-triplet), with the
    BCEs computed from logits (stable form) and hist over sigmoid probs."""
    import jax.numpy as jnp

    from laff_tpu.engine.trainer import _task2_loss
    from laff_tpu.models.spec import Task2Spec
    from laff_tpu.ops import triplet_loss_from_scores
    from laff_tpu.ops.similarity import hist_sim

    rng = np.random.default_rng(0)
    B, C = 4, 6
    tl = rng.normal(size=(B, C)).astype(np.float32)
    vl = rng.normal(size=(B, C)).astype(np.float32)
    labels = (rng.uniform(size=(B, C)) > 0.5).astype(np.float32)
    spec = Task2Spec(n_concepts=C, vis_dim_in=8, txt_dim_in=8, alpha=0.3)

    got = float(_task2_loss(jnp.asarray(tl), jnp.asarray(vl),
                            jnp.asarray(labels), spec))

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    def bce(logits):
        p = sig(logits)
        per = -(labels * np.log(p) + (1 - labels) * np.log1p(-p))
        return per.sum(axis=1).mean()

    trip = float(triplet_loss_from_scores(
        hist_sim(jnp.asarray(sig(vl)), jnp.asarray(sig(tl))),
        cost_style="mean",
    ))
    want = 0.3 * (bce(vl) + bce(tl) + trip)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_task2_txt_feature_must_exist(task2_world):
    """txt_feature_task2 pointing at an inactive encoder fails loudly."""
    from laff_tpu.engine import prepare
    from laff_tpu.engine.prepare import load_config

    opt = _opts(task2_world, "bad", task2_caption="obj", task2_intended=1)
    cfg = load_config("tiny")
    cfg.txt_feature_task2 = "w2v"
    cfg.text_encoding = dict(cfg.text_encoding,
                             w2v_encoding={"name": "now2v"})  # w2v inactive
    import sys

    # laff_tpu.engine re-exports prepare as a function; fetch the module
    P = sys.modules["laff_tpu.engine.prepare"]
    orig = P.load_config
    P.load_config = lambda name: cfg
    try:
        with pytest.raises(ValueError, match="txt_feature_task2"):
            prepare(opt)
    finally:
        P.load_config = orig
