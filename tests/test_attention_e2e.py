"""End-to-end training smoke across the attention-zoo registry.

The 17 fusion kinds are parity-tested at module level
(test_attention*.py); this exercises the FULL wiring — config decode ->
FusionTower -> loss path (multi-space vs single) -> trainer epoch ->
validation — for a representative subset, catching registry/shape bugs
no module test can (e.g. single-space kinds flowing into the
multi-space loss branch)."""

import numpy as np
import pytest

from laff_tpu.configs.base_config import ATTENTION_TYPES
from laff_tpu.engine import Options
from laff_tpu.engine.trainer import main as train_main

from helpers import build_collection, build_w2v


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("attn_e2e"))
    build_collection(root, "toytrain", n_videos=20, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=10, caps_per_video=1, seed=5)
    build_w2v(root)
    return root


# one representative per structural family: plain gate, gate+residual,
# mean pool, fc gate, concat, QKV, official MHA, self-attn, MMT,
# LAFF multi-head, fusion-mix, layer-norm, distinct-fc
KINDS = [
    ATTENTION_TYPES[0],   # gate + annealed mean residual
    ATTENTION_TYPES[3],   # fc_attention
    ATTENTION_TYPES[4],   # just_average
    ATTENTION_TYPES[5],   # muti_head_attention (QKV attention_2)
    ATTENTION_TYPES[7],   # plain gate
    ATTENTION_TYPES[8],   # concat
    ATTENTION_TYPES[10],  # official MHA wrapper
    ATTENTION_TYPES[11],  # my_self_attention
    ATTENTION_TYPES[13],  # fusion-mix multi-head
    ATTENTION_TYPES[14],  # layer-norm multi-head
    ATTENTION_TYPES[15],  # distinct-fc multi-head
    ATTENTION_TYPES[16],  # MMT-style
]


def _run_kind(world, kind, prefix, tweak=None):
    import sys

    from laff_tpu.engine.prepare import load_config

    cfg = load_config("tiny")
    cfg.txt_attention = kind
    cfg.vis_attention = kind
    if tweak:
        tweak(cfg)
    P = sys.modules["laff_tpu.engine.prepare"]
    orig = P.load_config
    P.load_config = lambda name: cfg
    try:
        opt = Options(
            trainCollection="toytrain", valCollection="toyval", rootpath=world,
            val_set="no", config_name="tiny", num_epochs=1, batch_size=10,
            model_prefix=prefix, metric="mir",
        )
        result = train_main(opt)
    finally:
        P.load_config = orig
    assert np.isfinite(result["history"][0]["loss"]), kind
    # validation produced a real ranking (mir > 0 always holds: 1/rank sums)
    assert result["best_perf"] > 0
    return result


@pytest.mark.parametrize("kind", KINDS)
def test_attention_kind_trains_e2e(world, kind):
    _run_kind(world, kind, f"attn_{KINDS.index(kind)}")


def test_official_mha_max_agg_trains(world):
    def tweak(cfg):
        cfg.muti_head_attention_official = dict(
            cfg.muti_head_attention_official, agg="max")

    _run_kind(world, ATTENTION_TYPES[10], "attn_off_max", tweak)


def test_self_attention_max_embedding_trains(world):
    """max_embedding prepends a max-pooled token like MMT — the same
    jnp.max-VJP x BatchNorm-backward XLA miscompile would NaN here too
    without the gather-by-argmax _max_token form."""
    def tweak(cfg):
        cfg.my_self_attention_output_type = "max_embedding"

    _run_kind(world, ATTENTION_TYPES[11], "attn_self_max", tweak)
