"""The LAFF fusion-attention zoo.

Parity targets: reference ``model/Attention.py`` (938 LoC of nn.Modules)
and the string registry in ``model/model.py:70-208``. The TPU-first
redesign collapses the reference's per-head Python loops
(``Attention.py:525-529``) into head-vectorized einsums: the whole
multi-head LAFF gate is two MXU contractions + one VPU softmax, with
with_ave/mul as per-head constant vectors instead of per-head submodules.

Naming: the registry keys are kept verbatim (they are serialized into
configs and ``adjust_parm`` index tables), but the implementations are
fresh flax modules.

The annealed mean-pool residual weight (reference ``global_emb_weight_net``,
a Linear(1,1) overwritten every epoch by ``change_raw_global_emb_weight``)
is modeled as a non-trained scalar in the ``schedule`` variable collection,
set per-epoch by the trainer.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norms import l2norm
from .initializers import torch_linear_init
from .spec import AttentionSpec

_NEG_INF = -1e30


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x, axis=axis)
    mask = mask.astype(x.dtype)
    total = jnp.sum(x * jnp.expand_dims(mask, -1), axis=axis)
    count = jnp.clip(jnp.sum(mask, axis=axis), min=1.0)
    return total / count[..., None]


class GateAttention(nn.Module):
    """Attention_1 (reference ``Attention.py:40-105``): softmax gate over
    the L axis; optional mean-pool residual scaled by the scheduled weight;
    optional gating on ``local * mean`` (mul). Supports a validity mask
    over L (absent in the reference, needed for batched frame fusion).
    """

    with_ave: bool = True
    mul: bool = False

    @nn.compact
    def __call__(
        self,
        local_embs: jnp.ndarray,  # (B, L, D)
        raw_global_emb: Optional[jnp.ndarray] = None,  # (B, D)
        mask: Optional[jnp.ndarray] = None,  # (B, L) 1=valid
    ) -> jnp.ndarray:
        if raw_global_emb is None:
            raw_global_emb = _masked_mean(local_embs, mask, axis=1)
        common = local_embs
        if self.mul:
            common = local_embs * raw_global_emb[:, None, :]

        logits = nn.Dense(
            1,
            # torch nn.Linear defaults (the reference does NOT xavier its
            # gates); see initializers.py for the measured basin gap
            kernel_init=torch_linear_init(local_embs.shape[-1]),
            bias_init=torch_linear_init(local_embs.shape[-1]),
            name="gate",
        )(common)[..., 0]  # (B, L)
        if mask is not None:
            logits = jnp.where(mask > 0, logits, _NEG_INF)
        weights = jax.nn.softmax(logits, axis=1)
        self.sow("intermediates", "attn_weights", weights)

        out = jnp.sum(weights[..., None] * local_embs, axis=1)
        if self.with_ave:
            # declared only when used, so with_ave=False checkpoints carry
            # no schedule collection
            g = self.variable(
                "schedule", "global_emb_weight", lambda: jnp.ones(())
            )
            # the reference adds g*mean to EVERY position before the sum
            # over L (Attention.py:99-101), so the residual is g * sum(x)
            if mask is None:
                count = float(local_embs.shape[1])
            else:
                count = jnp.clip(jnp.sum(mask.astype(out.dtype), axis=1),
                                 min=1.0)[:, None]
            out = out + g.value * raw_global_emb * count
        return l2norm(out, eps=0.0)


class MultiHeadGateAttention(nn.Module):
    """The LAFF-ml core (Multi_head_MyApply_Attention,
    ``Attention.py:473-531``) plus its layer_norm / distinct_fc / fusion-mix
    siblings, all as one head-vectorized kernel.

    (B, L, D) -> (B, H, d): split D into H heads (or repeat when
    ``split_head=False``), gate each head independently over L, weighted-sum,
    optional mean residual, per-head l2norm.

    ``with_ave``/``mul`` may differ per head (fusion-mix) — they enter as
    constant (H,) vectors so everything stays one fused computation.
    ``ave_style``: 'one' keeps the attention output at weight 1 and adds
    g * mean (Attention_1); 'one_minus_g' blends (1-g) * attn + g * mean
    (Attention_layer_norm).
    ``distinct_fc``: a separate gate fc per L position (distinct_fc variant,
    max 40 positions in the reference).
    """

    heads: int
    with_ave: bool = True
    mul: bool = False
    split_head: bool = True
    l2norm_each_head: bool = False
    pre_layer_norm: bool = False
    ave_style: str = "one"
    distinct_fc: bool = False
    max_positions: int = 40
    fusion_mix: bool = False  # per-head (with_ave, mul) cycling as i%4

    @nn.compact
    def __call__(
        self,
        local_embs: jnp.ndarray,  # (B, L, D)
        raw_global_emb: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,  # (B, L)
    ) -> jnp.ndarray:
        b, length, dim = local_embs.shape
        h = self.heads
        if self.split_head:
            if dim % h:
                raise ValueError(
                    f"common_dim {dim} not divisible by heads {h} (split_head)"
                )
            dh = dim // h
            x = local_embs.reshape(b, length, h, dh)
        else:
            dh = dim
            x = jnp.broadcast_to(local_embs[:, :, None, :], (b, length, h, dh))

        if self.l2norm_each_head:
            x = l2norm(x, axis=-1)
        if self.pre_layer_norm:
            # one LayerNorm per head (the reference builds a separate
            # Attention_layer_norm submodule per head, Attention.py:815-818)
            ln_scale = self.param("pre_ln_scale", nn.initializers.ones, (h, dh))
            ln_bias = self.param("pre_ln_bias", nn.initializers.zeros, (h, dh))
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
            x = (x - mean) / jnp.sqrt(var + 1e-5)
            x = x * ln_scale[None, None] + ln_bias[None, None]

        if self.fusion_mix:
            cyc = jnp.arange(h) % 4
            with_ave_vec = (cyc < 2).astype(x.dtype)  # heads 0,1: with_ave
            mul_vec = (cyc % 2 == 0).astype(x.dtype)  # heads 0,2: mul
        else:
            with_ave_vec = jnp.full((h,), float(self.with_ave), x.dtype)
            mul_vec = jnp.full((h,), float(self.mul), x.dtype)

        if mask is None:
            raw_global = jnp.mean(x, axis=1)  # (B, H, dh)
        else:
            m = mask.astype(x.dtype)[:, :, None, None]
            raw_global = jnp.sum(x * m, axis=1) / jnp.clip(
                jnp.sum(m, axis=1), min=1.0
            )
        if raw_global_emb is not None:
            raw_global = raw_global_emb  # (B, H, dh), pre-split by caller

        # gate input: per-head blend of x and x*mean (mul as a constant mask)
        common = x * (1.0 - mul_vec)[None, None, :, None] + (
            x * raw_global[:, None, :, :]
        ) * mul_vec[None, None, :, None]

        if self.distinct_fc:
            kernel = self.param(
                "gate_kernel",
                torch_linear_init(dh),
                (h, self.max_positions, dh),
            )
            bias = self.param(
                "gate_bias", torch_linear_init(dh), (h, self.max_positions)
            )
            logits = (
                jnp.einsum("blhd,hld->blh", common, kernel[:, :length, :])
                + bias[:, :length].T[None]
            )
        else:
            kernel = self.param(
                "gate_kernel", torch_linear_init(dh), (h, dh)
            )
            bias = self.param("gate_bias", torch_linear_init(dh), (h,))
            logits = jnp.einsum("blhd,hd->blh", common, kernel) + bias

        if mask is not None:
            logits = jnp.where(mask[:, :, None] > 0, logits, _NEG_INF)
        weights = jax.nn.softmax(logits, axis=1)  # (B, L, H)
        self.sow("intermediates", "attn_weights", weights)

        out = jnp.einsum("blh,blhd->bhd", weights, x)

        if self.with_ave or self.fusion_mix:
            g = self.variable(
                "schedule", "global_emb_weight", lambda: jnp.ones(())
            )
            if self.ave_style == "one_minus_g":
                attn_w = 1.0 - g.value
            else:
                attn_w = 1.0
            # reference adds g*mean per position before summing over L
            # (Attention.py:99-101): residual = g * L * mean = g * sum(x)
            if mask is None:
                count = float(length)
            else:
                count = jnp.clip(jnp.sum(mask.astype(out.dtype), axis=1),
                                 min=1.0)[:, None, None]
            residual = with_ave_vec[None, :, None] * g.value * raw_global * count
            out = jnp.where(
                with_ave_vec[None, :, None] > 0, attn_w * out + residual, out
            )
        return l2norm(out, axis=-1, eps=0.0)


class LinearCombine(nn.Module):
    """fc_attention / con_attention: a learned linear combination over the
    L axis (reference ``Attention.py:10-23`` + Conv1d(L,1,1)); both reduce
    to out[b,d] = sum_l w_l x[b,l,d] + bias."""

    @nn.compact
    def __call__(self, local_embs: jnp.ndarray, raw_global_emb=None, mask=None):
        length = local_embs.shape[1]
        w = self.param("kernel", nn.initializers.xavier_uniform(), (length, 1))
        b = self.param("bias", nn.initializers.zeros, (1,))
        return jnp.einsum("bld,l->bd", local_embs, w[:, 0]) + b


class JustAverage(nn.Module):
    @nn.compact
    def __call__(self, local_embs: jnp.ndarray, raw_global_emb=None, mask=None):
        return _masked_mean(local_embs, mask, axis=1)


class QKVAttention(nn.Module):
    """Attention_2 (reference ``Attention.py:108-167``): per-head tanh QKV
    projections, scaled dot product (softmax over the *query* axis, a
    reference quirk kept for parity), concat heads, Linear back to D,
    sum over L + mean residual, l2norm."""

    heads: int = 1
    embed_dim_qkv: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, local_embs, raw_global_emb=None, mask=None, train: bool = False):
        if raw_global_emb is None:
            raw_global_emb = jnp.mean(local_embs, axis=1)
        outs = []
        for i in range(self.heads):
            def proj(name):
                return nn.Dense(
                    self.embed_dim_qkv,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=f"{name}_{i}",
                )
            drop = nn.Dropout(rate=self.dropout, deterministic=not train)
            q = drop(nn.tanh(proj("q")(local_embs)))
            k = drop(nn.tanh(proj("k")(local_embs)))
            v = drop(nn.tanh(proj("v")(local_embs)))
            w = jnp.einsum("bld,bmd->blm", q, k) / (self.embed_dim_qkv ** 0.5)
            w = jax.nn.softmax(w, axis=1)
            outs.append(jnp.einsum("blm,bmd->bld", w, v))
        new_v = jnp.concatenate(outs, axis=-1)
        out = nn.Dense(
            local_embs.shape[-1],
            kernel_init=nn.initializers.xavier_uniform(),
            name="out",
        )(new_v)
        out = jnp.sum(out, axis=1) + raw_global_emb
        return l2norm(out, eps=1e-15)


class SimpleSelfAttention(nn.Module):
    """Attention_3 (reference ``Attention.py:170-204``): one-head QKV =
    identity self-attention, Linear(D->D), sum over L + mean residual."""

    @nn.compact
    def __call__(self, local_embs, raw_global_emb=None, mask=None):
        if raw_global_emb is None:
            raw_global_emb = jnp.mean(local_embs, axis=1)
        d = local_embs.shape[-1]
        w = jnp.einsum("bld,bmd->blm", local_embs, local_embs) / (d ** 0.5)
        w = jax.nn.softmax(w, axis=1)  # reference softmax(dim=1) quirk
        ctx = jnp.einsum("blm,bmd->bld", w, local_embs)
        out = nn.Dense(
            d, kernel_init=nn.initializers.xavier_uniform(), name="out"
        )(ctx)
        out = jnp.sum(out, axis=1) + raw_global_emb
        return l2norm(out, eps=1e-15)


def _torch_style_mha(x, heads, name_scope):
    """Functional multi-head self-attention with torch's packed in_proj
    layout, so reference MultiheadAttention weights import 1:1."""
    # x: (B, L, D)
    d = x.shape[-1]

    class _MHA(nn.Module):
        @nn.compact
        def __call__(self, x):
            in_proj_w = self.param(
                "in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d)
            )
            in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
            q = x @ in_proj_w[:d].T + in_proj_b[:d]
            k = x @ in_proj_w[d : 2 * d].T + in_proj_b[d : 2 * d]
            v = x @ in_proj_w[2 * d :].T + in_proj_b[2 * d :]
            b, l, _ = x.shape
            dh = d // heads
            q = q.reshape(b, l, heads, dh).transpose(0, 2, 1, 3) * (dh ** -0.5)
            k = k.reshape(b, l, heads, dh).transpose(0, 2, 1, 3)
            v = v.reshape(b, l, heads, dh).transpose(0, 2, 1, 3)
            w = jax.nn.softmax(jnp.einsum("bhld,bhmd->bhlm", q, k), axis=-1)
            ctx = jnp.einsum("bhlm,bhmd->bhld", w, v)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
            out_w = self.param(
                "out_proj_weight", nn.initializers.xavier_uniform(), (d, d)
            )
            out_b = self.param("out_proj_bias", nn.initializers.zeros, (d,))
            return ctx @ out_w.T + out_b

    return _MHA(name=name_scope)(x)


class OfficialMHA(nn.Module):
    """muti_head_attention_official (reference ``Attention.py:207-241``):
    self-attention + residual + LayerNorm, then mean/max over L."""

    heads: int = 8
    agg: str = "mean"

    @nn.compact
    def __call__(self, local_embs, raw_global_emb=None, mask=None):
        attn = _torch_style_mha(local_embs, self.heads, "mha")
        out = nn.LayerNorm(name="ln")(local_embs + attn)
        if self.agg == "max":
            return jnp.max(out, axis=1)
        return jnp.mean(out, axis=1)


def _max_token(x):
    """Token-axis max with the gradient routed to the argmax element
    (torch.max semantics). NOT ``jnp.max``: its VJP (mask / tie-count
    division) fused with an upstream BatchNorm's training-mode backward
    miscompiles to NaN grads on XLA CPU (finite eagerly, NaN under jit —
    caught by tests/test_attention_e2e.py); the gather-by-argmax form
    lowers to a scatter and is also bit-closer to torch, which sends the
    whole gradient to the first maximum instead of splitting ties."""
    idx = jax.lax.stop_gradient(jnp.argmax(x, axis=1, keepdims=True))
    return jnp.take_along_axis(x, idx, axis=1)


class MMTAttention(nn.Module):
    """Attention_MMT (reference ``Attention.py:244-277``): prepend the
    max-pooled token, self-attend, return the aggregate token."""

    heads: int = 8

    @nn.compact
    def __call__(self, local_embs, raw_global_emb=None, mask=None):
        agg = _max_token(local_embs)
        x = jnp.concatenate([agg, local_embs], axis=1)
        attn = _torch_style_mha(x, self.heads, "mha")
        out = nn.LayerNorm(name="ln")(x + attn)
        return out[:, 0, :]


class MultiHeadSelfAttention(nn.Module):
    """my_self_attention (Multi_head_MyApply_selfAttention, reference
    ``Attention.py:317-470``): projection-free per-head scaled dot-product
    self-attention + per-head LayerNorm, then one of the output_type
    aggregations over the token axis."""

    heads: int
    dropout: float = 0.0
    output_type: str = "mean"
    l2norm_each_head: bool = False
    encoder_num: int = 0
    head_with_ave: bool = True
    head_mul: bool = False

    @nn.compact
    def __call__(self, local_embs, raw_global_emb=None, mask=None, train: bool = False):
        b, length, d = local_embs.shape
        h, dh = self.heads, d // self.heads

        x = local_embs
        if self.output_type == "cls_embedding":
            cls = self.param(
                "cls_embedding", nn.initializers.normal(1.0), (1, d)
            )
            cls = l2norm(cls, axis=-1)
            x = jnp.concatenate([jnp.broadcast_to(cls[None], (b, 1, d)), x], axis=1)
        elif self.output_type == "concat":
            cat = nn.Dense(
                d, kernel_init=nn.initializers.xavier_uniform(), name="concat_fc"
            )(x.reshape(b, -1))
            x = jnp.concatenate([cat[:, None, :], x], axis=1)
        elif self.output_type == "max_embedding":
            x = jnp.concatenate([_max_token(x), x], axis=1)
        elif self.output_type == "mean_embedding":
            x = jnp.concatenate([jnp.mean(x, axis=1, keepdims=True), x], axis=1)

        length2 = x.shape[1]
        xh = x.reshape(b, length2, h, dh).transpose(0, 2, 1, 3)  # (B,H,L,dh)
        if self.l2norm_each_head:
            xh = l2norm(xh, axis=-1)
        scale = (dh // h) ** -0.5 if dh >= h else 1.0  # reference quirk
        w = jax.nn.softmax(jnp.einsum("bhld,bhmd->bhlm", xh, xh) * scale, axis=-1)
        w = nn.Dropout(rate=self.dropout, deterministic=not train)(w)
        ctx = jnp.einsum("bhlm,bhmd->bhld", w, xh)
        out = nn.LayerNorm(name="ln")(ctx + xh)  # (B, H, L', dh)

        ot = self.output_type
        if ot == "mean":
            return jnp.mean(out, axis=2)
        if ot in ("first", "cls_embedding", "concat", "max_embedding", "mean_embedding"):
            return out[:, :, 0, :]
        if ot == "max":
            return jnp.max(out, axis=2)
        if ot == "last":
            return out[:, :, -1, :]
        if ot == "second":
            return out[:, :, min(1, length2 - 1), :]
        if ot == "third":
            return out[:, :, min(2, length2 - 1), :]
        if ot == "random":
            if train:
                rng = self.make_rng("dropout")
                idx = jax.random.randint(rng, (), 0, length)
                return out[:, :, idx, :]
            return jnp.mean(out, axis=2)
        if ot == "Attention_1":
            flat = out.transpose(0, 2, 1, 3).reshape(b, length2, h * dh)
            return MultiHeadGateAttention(
                heads=h,
                with_ave=self.head_with_ave,
                mul=self.head_mul,
                split_head=True,
                name="head_attn",
            )(flat)
        raise ValueError(f"output_type {ot}")


class NetVLAD(nn.Module):
    """NetVLAD pooling (reference ``Attention.py:862-913``), batched with a
    token-validity mask instead of a list of variable-length tensors."""

    num_clusters: int = 32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        # tokens: (B, M, D), mask: (B, M)
        b, m, d = tokens.shape
        init_sc = 1.0 / (d ** 0.5)
        assign_w = self.param(
            "assign", nn.initializers.normal(init_sc), (self.num_clusters, d)
        )
        centroids = self.param(
            "centroids", nn.initializers.normal(init_sc), (self.num_clusters, d)
        )
        x = tokens / jnp.clip(
            jnp.linalg.norm(tokens, axis=-1, keepdims=True), min=1e-12
        )
        soft = jax.nn.softmax(x @ assign_w.T, axis=-1)  # (B, M, K)
        if mask is not None:
            soft = soft * mask[:, :, None]
        residual = x[:, :, None, :] - centroids[None, None, :, :]  # (B,M,K,D)
        vlad = jnp.sum(residual * soft[..., None], axis=1)  # (B,K,D)
        vlad = vlad / jnp.clip(jnp.linalg.norm(vlad, axis=-1, keepdims=True), min=1e-12)
        vlad = vlad.reshape(b, -1)
        return vlad / jnp.clip(jnp.linalg.norm(vlad, axis=-1, keepdims=True), min=1e-12)


# ---------------------------------------------------------------------------
# registry (keys mirror reference ``model/model.py:70-208`` +
# ``configs/base_config.py:107-124`` index table)
# ---------------------------------------------------------------------------

ATTENTION_TYPES = (
    "attention_noAverageMul_Ave",      # 0
    "average_AverageMul_noAve",        # 1
    "con_attention",                   # 2
    "fc_attention",                    # 3
    "just_average",                    # 4
    "muti_head_attention",             # 5
    "attention3",                      # 6
    "attention_noAveNoAverageMul",     # 7
    "concat",                          # 8
    "attention_averageMul",            # 9
    "muti_head_attention_official",    # 10
    "my_self_attention",               # 11
    "Multi_head_MyApply_Attention",    # 12
    "Multi_head_MyApply_FusionAttention",  # 13
    "Multi_head_Attention_layer_norm",     # 14
    "Multi_head_Attention_distinct_fc",    # 15
    "Attention_MMT",                   # 16
)


def get_attention_layer(
    kind: str, encoder_num: int, spec: AttentionSpec, name: str = "attention"
) -> nn.Module:
    """Build a fusion-attention module by registry key."""
    if kind == "attention_noAverageMul_Ave":
        return GateAttention(with_ave=True, mul=False, name=name)
    if kind == "attention_noAveNoAverageMul":
        return GateAttention(with_ave=False, mul=False, name=name)
    if kind == "attention_averageMul":
        return GateAttention(with_ave=True, mul=True, name=name)
    if kind == "average_AverageMul_noAve":
        return GateAttention(with_ave=False, mul=True, name=name)
    if kind in ("con_attention", "fc_attention"):
        return LinearCombine(name=name)
    if kind == "just_average":
        return JustAverage(name=name)
    if kind == "muti_head_attention":
        return QKVAttention(
            heads=spec.heads, embed_dim_qkv=spec.embed_dim_qkv,
            dropout=spec.dropout, name=name,
        )
    if kind == "attention3":
        return SimpleSelfAttention(name=name)
    if kind == "muti_head_attention_official":
        return OfficialMHA(heads=8, agg=spec.agg, name=name)
    if kind == "Attention_MMT":
        return MMTAttention(heads=8, name=name)
    if kind == "my_self_attention":
        return MultiHeadSelfAttention(
            heads=spec.heads, dropout=spec.dropout,
            output_type=spec.output_type,
            l2norm_each_head=spec.l2norm_each_head,
            encoder_num=encoder_num,
            head_with_ave=spec.with_ave, head_mul=spec.mul,
            name=name,
        )
    if kind == "Multi_head_MyApply_Attention":
        return MultiHeadGateAttention(
            heads=spec.heads, with_ave=spec.with_ave, mul=spec.mul,
            split_head=spec.split_head,
            l2norm_each_head=spec.l2norm_each_head, name=name,
        )
    if kind == "Multi_head_MyApply_FusionAttention":
        return MultiHeadGateAttention(
            heads=spec.heads, split_head=spec.split_head,
            fusion_mix=True, name=name,
        )
    if kind == "Multi_head_Attention_layer_norm":
        return MultiHeadGateAttention(
            heads=spec.heads, with_ave=spec.with_ave, mul=spec.mul,
            split_head=spec.split_head, pre_layer_norm=True,
            ave_style="one_minus_g", name=name,
        )
    if kind == "Multi_head_Attention_distinct_fc":
        return MultiHeadGateAttention(
            heads=spec.heads, with_ave=spec.with_ave, mul=spec.mul,
            split_head=spec.split_head, distinct_fc=True, name=name,
        )
    raise KeyError(f"unknown attention type: {kind}")
