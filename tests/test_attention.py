"""Attention-zoo numerics: hand-computed oracles for the LAFF gate and the
multi-head core, shape/registry checks for the rest of the zoo."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laff_tpu.models import AttentionSpec, get_attention_layer
from laff_tpu.models.attention import (
    ATTENTION_TYPES,
    GateAttention,
    MultiHeadGateAttention,
    NetVLAD,
)


def np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_attention1(x, w, b, g, with_ave, mul):
    """Reference Attention_1 forward (Attention.py:78-105) in numpy."""
    raw = x.mean(1)
    common = x * raw[:, None, :] if mul else x
    logits = common @ w + b  # (B, L)
    wts = np_softmax(logits, 1)
    out = (wts[..., None] * x).sum(1)
    if with_ave:
        out = out + g * raw * x.shape[1]  # residual added per position
    norm = np.sqrt((out * out).sum(-1, keepdims=True)) + 1e-14
    return out / norm


@pytest.mark.parametrize("with_ave", [True, False])
@pytest.mark.parametrize("mul", [True, False])
def test_gate_attention_matches_oracle(rng, with_ave, mul):
    x = rng.standard_normal((6, 4, 16)).astype(np.float32)
    mod = GateAttention(with_ave=with_ave, mul=mul)
    variables = mod.init(jax.random.key(0), jnp.asarray(x))
    w = np.asarray(variables["params"]["gate"]["kernel"])[:, 0]
    b = float(np.asarray(variables["params"]["gate"]["bias"])[0])
    g = 1.0
    ours = np.asarray(mod.apply(variables, jnp.asarray(x)))
    oracle = np_attention1(x, w, b, g, with_ave, mul)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("with_ave", [True, False])
@pytest.mark.parametrize("mul", [True, False])
@pytest.mark.parametrize("split_head", [True, False])
def test_multihead_gate_matches_per_head_oracle(rng, with_ave, mul, split_head):
    """The vectorized multi-head kernel must equal H independent
    Attention_1 heads (reference Attention.py:508-531)."""
    heads, dh = 4, 8
    dim = heads * dh if split_head else 16
    x = rng.standard_normal((5, 3, dim)).astype(np.float32)
    mod = MultiHeadGateAttention(
        heads=heads, with_ave=with_ave, mul=mul, split_head=split_head
    )
    variables = mod.init(jax.random.key(1), jnp.asarray(x))
    kernel = np.asarray(variables["params"]["gate_kernel"])  # (H, dh)
    bias = np.asarray(variables["params"]["gate_bias"])  # (H,)
    ours = np.asarray(mod.apply(variables, jnp.asarray(x)))

    d_per = dim // heads if split_head else dim
    expected = np.zeros((5, heads, d_per), np.float32)
    for h in range(heads):
        xh = (
            x.reshape(5, 3, heads, d_per)[:, :, h, :]
            if split_head
            else x
        )
        expected[:, h] = np_attention1(xh, kernel[h], bias[h], 1.0, with_ave, mul)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_multihead_gate_schedule_weight(rng):
    """Annealing the mean-pool residual weight changes the output exactly
    like the reference change_raw_global_emb_weight."""
    x = jnp.asarray(rng.standard_normal((4, 3, 32)).astype(np.float32))
    mod = MultiHeadGateAttention(heads=4, with_ave=True, mul=False)
    variables = mod.init(jax.random.key(2), x)
    out1 = mod.apply(variables, x)

    sched = flax.core.unfreeze(variables["schedule"])
    sched["global_emb_weight"] = jnp.asarray(0.0)
    variables0 = {"params": variables["params"], "schedule": sched}
    out0 = mod.apply(variables0, x)

    # weight 0 == with_ave=False
    mod_noave = MultiHeadGateAttention(heads=4, with_ave=False, mul=False)
    out_noave = mod_noave.apply({"params": variables["params"]}, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out_noave), rtol=1e-5)
    assert not np.allclose(np.asarray(out1), np.asarray(out0))


def test_masked_gate_attention_ignores_padding(rng):
    """Frame fusion: padded frames must not change the pooled vector."""
    x_short = rng.standard_normal((2, 3, 16)).astype(np.float32)
    pad = np.concatenate([x_short, 999.0 * np.ones((2, 2, 16), np.float32)], axis=1)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 0, 0]], np.float32)
    mod = GateAttention(with_ave=True, mul=False)
    variables = mod.init(jax.random.key(3), jnp.asarray(x_short))
    out_short = mod.apply(variables, jnp.asarray(x_short))
    out_masked = mod.apply(variables, jnp.asarray(pad), mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out_short), np.asarray(out_masked), rtol=1e-5, atol=1e-6
    )


def test_fusion_mix_heads(rng):
    """Fusion-mix: head i uses (with_ave, mul) = cycle of 4 combos."""
    heads, dh = 8, 4
    x = rng.standard_normal((3, 5, heads * dh)).astype(np.float32)
    mod = MultiHeadGateAttention(heads=heads, split_head=True, fusion_mix=True)
    variables = mod.init(jax.random.key(4), jnp.asarray(x))
    kernel = np.asarray(variables["params"]["gate_kernel"])
    bias = np.asarray(variables["params"]["gate_bias"])
    ours = np.asarray(mod.apply(variables, jnp.asarray(x)))
    combos = [(True, True), (True, False), (False, True), (False, False)]
    for h in range(heads):
        wa, ml = combos[h % 4]
        xh = x.reshape(3, 5, heads, dh)[:, :, h, :]
        exp = np_attention1(xh, kernel[h], bias[h], 1.0, wa, ml)
        np.testing.assert_allclose(ours[:, h], exp, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "kind",
    [k for k in ATTENTION_TYPES if k != "concat"],
)
def test_registry_builds_and_runs(rng, kind):
    heads = 4
    x = jnp.asarray(rng.standard_normal((2, 3, 32)).astype(np.float32))
    spec = AttentionSpec(kind=kind, heads=heads, embed_dim_qkv=8)
    mod = get_attention_layer(kind, 3, spec)
    variables = mod.init(
        {"params": jax.random.key(5), "dropout": jax.random.key(6)}, x
    )
    out = mod.apply(variables, x)
    multi = kind in (
        "my_self_attention",
        "Multi_head_MyApply_Attention",
        "Multi_head_MyApply_FusionAttention",
        "Multi_head_Attention_layer_norm",
        "Multi_head_Attention_distinct_fc",
    )
    if multi:
        assert out.shape == (2, heads, 32 // heads)
    else:
        assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_netvlad_shapes(rng):
    tokens = jnp.asarray(rng.standard_normal((3, 7, 20)).astype(np.float32))
    mask = jnp.asarray((rng.random((3, 7)) > 0.3).astype(np.float32))
    mod = NetVLAD(num_clusters=8)
    variables = mod.init(jax.random.key(7), tokens, mask)
    out = mod.apply(variables, tokens, mask)
    assert out.shape == (3, 8 * 20)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-5)
