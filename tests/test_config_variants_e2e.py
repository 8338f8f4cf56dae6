"""End-to-end training smoke across config axes beyond the attention kind:
loss zoo, similarity measure, netvlad text encoding, expert embeddings,
and the concat pseudo-feature. Same rationale as test_attention_e2e —
module tests can't catch wiring bugs between config decode, the feed,
the towers, and the loss/metric paths (the netvlad cache-estimate bug
and the MMT NaN both lived exactly there)."""

import sys

import numpy as np
import pytest

from laff_tpu.engine import Options
from laff_tpu.engine.trainer import main as train_main

from helpers import build_collection, build_w2v


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cfg_e2e"))
    build_collection(root, "toytrain", n_videos=20, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=10, caps_per_video=1, seed=5)
    build_w2v(root)
    return root


def _run(world, prefix, tweak):
    from laff_tpu.engine.prepare import load_config

    cfg = load_config("tiny")
    tweak(cfg)
    P = sys.modules["laff_tpu.engine.prepare"]
    orig = P.load_config
    P.load_config = lambda name: cfg
    try:
        result = train_main(Options(
            trainCollection="toytrain", valCollection="toyval",
            rootpath=world, val_set="no", config_name="tiny", num_epochs=1,
            batch_size=10, model_prefix=prefix, metric="mir",
        ))
    finally:
        P.load_config = orig
    assert np.isfinite(result["history"][0]["loss"]), prefix
    assert result["best_perf"] > 0
    return result


@pytest.mark.parametrize("loss", ["dsl", "CELoss"])
def test_loss_kind_trains_e2e(world, loss):
    _run(world, f"loss_{loss}", lambda c: setattr(c, "loss", loss))


def test_hist_measure_trains_e2e(world):
    """Jaccard similarity end to end: loss scores AND validation ranking
    both flow through the hist path."""
    def tweak(c):
        c.measure = "hist"
        c.multi_space = False  # hist validation scores are head-meaned

    _run(world, "hist", tweak)


def test_netvlad_encoding_trains_e2e(world):
    """NetVLAD text encoding: per-token w2v vectors through the feed's
    variable-width padding, the NetVLAD module, and the HBM cache
    estimator (whose netvlad width handling is load-bearing)."""
    def tweak(c):
        c.text_encoding = dict(
            c.text_encoding, NetVLAD_encoding={"name": "NetVLAD"})
        c.NetVLAD_opt = {"num_clusters": 4, "alpha": 100,
                         "normalize_pooling": False}

    _run(world, "netvlad", tweak)


def test_expert_embeddings_train_e2e(world):
    def tweak(c):
        c.txt_expert_embedding = {"expert": True, "l2norm": True}
        c.vis_expert_embedding = {"expert": True, "l2norm": True}

    _run(world, "expert", tweak)


def test_feat_add_concat_trains_e2e(world):
    """The concat-of-all pseudo-feature joins the fusion token list
    (reference vis_feat_add_concat, model/model.py:1811-1814)."""
    _run(world, "fac", lambda c: setattr(c, "vis_feat_add_concat", True))


def test_bf16_compute_trains_e2e(world):
    """config.float16 (reference AMP flag) -> bfloat16-compute towers +
    automatic host-side bf16 feature cast, trained end to end."""
    _run(world, "bf16", lambda c: setattr(c, "float16", True))


@pytest.mark.parametrize("rnn", ["bigru_mean", "gru_last", "gru_mean_last"])
def test_rnn_variant_trains_e2e(world, rnn):
    """Encoder-name decode (gru|bigru x mean|last|mean_last) through
    build_featurizers -> GruSpec -> lax.scan encoder."""
    def tweak(c):
        c.text_encoding = dict(c.text_encoding, rnn_encoding={"name": rnn})

    _run(world, f"rnn_{rnn}", tweak)


def test_single_space_trains_e2e(world):
    """multi_space=False over multi-head embeddings: the single-space loss
    branch (mean-of-head-sims into triplet) instead of per-head losses."""
    _run(world, "single", lambda c: setattr(c, "multi_space", False))
