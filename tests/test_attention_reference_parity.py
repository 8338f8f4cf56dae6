"""Module-level parity of the attention zoo against the REAL reference
torch implementations (imported from the read-only tree), with explicit
weight mappings. This is what caught the with_ave residual bug; these
tests pin every zoo member's semantics, not just the LAFF headline gate.
"""

import os
import sys

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/model"), reason="reference tree absent"
)

import jax
import jax.numpy as jnp

from laff_tpu.models.attention import (
    GateAttention,
    MMTAttention,
    MultiHeadGateAttention,
    MultiHeadSelfAttention,
    OfficialMHA,
    QKVAttention,
    SimpleSelfAttention,
)


@pytest.fixture(scope="module")
def ref_attn():
    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        module = importlib.import_module("model.Attention")
    except Exception as e:
        pytest.skip(f"reference Attention unavailable: {e}")
    finally:
        sys.path.remove("/root/reference")
    return module


def _t(arr):
    return torch.from_numpy(np.asarray(arr))


def test_attention2_qkv(ref_attn, rng):
    d, dq, heads = 16, 8, 2
    ref = ref_attn.Attention_2.__new__(ref_attn.Attention_2)
    torch.nn.Module.__init__(ref)
    ref.embed_dim = d
    ref.multi_heads = heads
    ref.embed_dim_qkv = dq
    ref.embedding_local_q = torch.nn.Sequential()
    ref.embedding_local_k = torch.nn.Sequential()
    ref.embedding_local_v = torch.nn.Sequential()
    for i in range(heads):
        for seq in (ref.embedding_local_q, ref.embedding_local_k, ref.embedding_local_v):
            seq.add_module(str(i), torch.nn.Sequential(
                torch.nn.Linear(d, dq), torch.nn.Tanh(), torch.nn.Dropout(0.0)))
    ref.embedding_common = torch.nn.Sequential(torch.nn.Linear(heads * dq, d))
    ref.softmax = torch.nn.Softmax(dim=1)
    ref.eval()

    x = rng.standard_normal((3, 4, d)).astype(np.float32)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()

    ours = QKVAttention(heads=heads, embed_dim_qkv=dq, dropout=0.1)
    params = {}
    for i in range(heads):
        for tag, seq in (("q", ref.embedding_local_q), ("k", ref.embedding_local_k),
                         ("v", ref.embedding_local_v)):
            lin = seq[i][0]
            params[f"{tag}_{i}"] = {
                "kernel": lin.weight.detach().numpy().T,
                "bias": lin.bias.detach().numpy(),
            }
    params["out"] = {
        "kernel": ref.embedding_common[0].weight.detach().numpy().T,
        "bias": ref.embedding_common[0].bias.detach().numpy(),
    }
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_attention3(ref_attn, rng):
    d = 12
    ref = ref_attn.Attention_3(d)
    ref.eval()
    x = rng.standard_normal((2, 5, d)).astype(np.float32)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    ours = SimpleSelfAttention()
    params = {"out": {
        "kernel": ref.embedding_common[0].weight.detach().numpy().T,
        "bias": ref.embedding_common[0].bias.detach().numpy(),
    }}
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def _mha_params(attn_layer, ln):
    return {
        "mha": {
            "in_proj_weight": attn_layer.in_proj_weight.detach().numpy(),
            "in_proj_bias": attn_layer.in_proj_bias.detach().numpy(),
            "out_proj_weight": attn_layer.out_proj.weight.detach().numpy(),
            "out_proj_bias": attn_layer.out_proj.bias.detach().numpy(),
        },
        "ln": {
            "scale": ln.weight.detach().numpy(),
            "bias": ln.bias.detach().numpy(),
        },
    }


@pytest.mark.parametrize("agg", ["mean", "max"])
def test_official_mha(ref_attn, rng, agg):
    d, heads = 16, 4
    torch.manual_seed(0)
    ref = ref_attn.Attention_multi_head_official(d, heads, 0.0, agg)
    ref.eval()
    x = rng.standard_normal((3, 5, d)).astype(np.float32)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    ours = OfficialMHA(heads=heads, agg=agg)
    params = _mha_params(ref.attention_layer, ref.layer_norm)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_mmt_attention(ref_attn, rng):
    d, heads = 16, 4
    torch.manual_seed(1)
    ref = ref_attn.Attention_MMT(d, heads, 0.0)
    ref.eval()
    x = rng.standard_normal((2, 4, d)).astype(np.float32)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    ours = MMTAttention(heads=heads)
    params = _mha_params(ref.attention_layer, ref.layer_norm)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_distinct_fc(ref_attn, rng):
    d, heads = 16, 2
    dh = d // heads
    torch.manual_seed(2)
    ref = ref_attn.Multi_head_Attention_distinct_fc(
        d, heads, dh, with_ave=True, mul=False, split_head=True
    )
    # the reference subclass never sets l2norm_each_head (its __init__
    # early-returns via super().__init__(None)) and would crash when
    # selected; set the intended default to exercise the math
    ref.l2norm_each_head = False
    ref.eval()
    x = rng.standard_normal((3, 4, d)).astype(np.float32)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()

    kernels = np.zeros((heads, 40, dh), np.float32)
    biases = np.zeros((heads, 40), np.float32)
    for h in range(heads):
        head = ref.attention_layer[h]
        for l in range(40):
            kernels[h, l] = head.embedding_common[l].weight.detach().numpy()[0]
            biases[h, l] = head.embedding_common[l].bias.detach().numpy()[0]
    ours = MultiHeadGateAttention(
        heads=heads, with_ave=True, mul=False, split_head=True, distinct_fc=True
    )
    variables = {
        "params": {"gate_kernel": kernels, "gate_bias": biases},
        "schedule": {"global_emb_weight": np.asarray(1.0, np.float32)},
    }
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_layer_norm_variant(ref_attn, rng):
    d, heads = 16, 2
    dh = d // heads
    torch.manual_seed(3)
    ref = ref_attn.Multi_head_Attention_layer_norm(
        d, heads, dh, with_ave=True, mul=False, split_head=True
    )
    # the reference subclass never sets l2norm_each_head (its __init__
    # early-returns via super().__init__(None)) and would crash when
    # selected; set the intended default to exercise the math
    ref.l2norm_each_head = False
    ref.eval()
    # give per-head LayerNorms distinct affine params to catch sharing bugs
    with torch.no_grad():
        for h in range(heads):
            ref.attention_layer[h].layer_norm.weight.uniform_(0.5, 1.5)
            ref.attention_layer[h].layer_norm.bias.uniform_(-0.3, 0.3)
            ref.attention_layer[h].global_emb_weight_net.weight.fill_(0.7)
    x = rng.standard_normal((3, 4, d)).astype(np.float32)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()

    kernels, biases = [], []
    ln_scale, ln_bias = [], []
    for h in range(heads):
        head = ref.attention_layer[h]
        kernels.append(head.embedding_common[0].weight.detach().numpy()[0])
        biases.append(head.embedding_common[0].bias.detach().numpy()[0])
        ln_scale.append(head.layer_norm.weight.detach().numpy())
        ln_bias.append(head.layer_norm.bias.detach().numpy())
    ours = MultiHeadGateAttention(
        heads=heads, with_ave=True, mul=False, split_head=True,
        pre_layer_norm=True, ave_style="one_minus_g",
    )
    variables = {
        "params": {
            "gate_kernel": np.stack(kernels),
            "gate_bias": np.asarray(biases, np.float32),
            "pre_ln_scale": np.stack(ln_scale),
            "pre_ln_bias": np.stack(ln_bias),
        },
        "schedule": {"global_emb_weight": np.asarray(0.7, np.float32)},
    }
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_my_self_attention_mean(ref_attn, rng):
    d, heads = 16, 2
    dh = d // heads
    torch.manual_seed(4)
    ref = ref_attn.Multi_head_MyApply_selfAttention(
        d, heads, dh, 0.0, output_type="mean"
    )
    ref.eval()
    x = rng.standard_normal((3, 4, d)).astype(np.float32)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    ours = MultiHeadSelfAttention(heads=heads, dropout=0.0, output_type="mean")
    params = {"ln": {
        "scale": ref.layer_norm.weight.detach().numpy(),
        "bias": ref.layer_norm.bias.detach().numpy(),
    }}
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_fusion_mix(ref_attn, rng):
    d, heads = 16, 4
    dh = d // heads
    torch.manual_seed(5)
    ref = ref_attn.Multi_head_MyApply_FusionAttention(d, heads, dh, split_head=True)
    ref.l2norm_each_head = False  # unset in the reference (latent crash)
    ref.eval()
    with torch.no_grad():
        for h in range(heads):
            ref.attention_layer[h].global_emb_weight_net.weight.fill_(0.5)
    x = rng.standard_normal((3, 4, d)).astype(np.float32)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()

    kernels, biases = [], []
    for h in range(heads):
        head = ref.attention_layer[h]
        kernels.append(head.embedding_common[0].weight.detach().numpy()[0])
        biases.append(head.embedding_common[0].bias.detach().numpy()[0])
    ours = MultiHeadGateAttention(heads=heads, split_head=True, fusion_mix=True)
    variables = {
        "params": {"gate_kernel": np.stack(kernels),
                   "gate_bias": np.asarray(biases, np.float32)},
        "schedule": {"global_emb_weight": np.asarray(0.5, np.float32)},
    }
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("with_ave,mul", [(True, False), (False, False),
                                          (True, True), (False, True)])
def test_attention1_direct(ref_attn, rng, with_ave, mul):
    d = 12
    torch.manual_seed(6)
    ref = ref_attn.Attention_1(d, with_ave=with_ave, mul=mul)
    ref.eval()
    with torch.no_grad():
        ref.global_emb_weight_net.weight.fill_(0.8)
    x = rng.standard_normal((4, 3, d)).astype(np.float32)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    ours = GateAttention(with_ave=with_ave, mul=mul)
    variables = {
        "params": {"gate": {
            "kernel": ref.embedding_common[0].weight.detach().numpy().T,
            "bias": ref.embedding_common[0].bias.detach().numpy(),
        }},
    }
    if with_ave:
        variables["schedule"] = {"global_emb_weight": np.asarray(0.8, np.float32)}
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
