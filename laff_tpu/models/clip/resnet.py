"""CLIP ModifiedResNet visual tower in flax (NHWC), with a torch importer.

Architecture parity target: the reference's vendored OpenAI CLIP ResNet
(``model/clip/model.py:10-150``) — a 3-conv stem with an avg-pool (no max
pool), anti-aliased strided convolutions (avg-pool prepended to every
stride-2 conv), Bottleneck residual stages, and a QKV attention pool
instead of global average pooling. RN50-family CLIP/StrongCLIP
checkpoints import through :func:`import_resnet_tower`.

TPU notes: convolutions run in NHWC (XLA's preferred TPU layout; the
importer transposes torch OIHW kernels to HWIO), BatchNorm uses running
statistics (the tower serves as a frozen feature extractor, matching the
reference's ``build_model(...).eval()``), and the attention pool computes
only the mean-token query — the reference evaluates full self-attention
and then keeps ``x[0]`` (model/clip/model.py:67-93), so dropping the
other queries is algebraically identical and (HW+1)x cheaper.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipResNetConfig:
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)  # RN50
    width: int = 64
    heads: int = 32          # reference: vision_width * 32 // 64
    image_size: int = 224
    embed_dim: int = 1024


class Bottleneck(nn.Module):
    """Reference Bottleneck (model/clip/model.py:10-53): all convs are
    stride 1; an avg-pool after conv2 (and before the downsample conv)
    realizes the stride."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        expansion = 4
        inplanes = x.shape[-1]

        def conv(features, size, name, padding=0):
            pad = ((padding, padding), (padding, padding))
            return nn.Conv(features, (size, size), use_bias=False,
                           padding=pad, name=name)

        def bn(name):
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                name=name)

        out = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2", padding=1)(out)))
        if self.stride > 1:
            s = (self.stride, self.stride)
            out = nn.avg_pool(out, s, strides=s)
        out = bn("bn3")(conv(self.planes * expansion, 1, "conv3")(out))

        if self.stride > 1 or inplanes != self.planes * expansion:
            identity = x
            if self.stride > 1:
                s = (self.stride, self.stride)
                identity = nn.avg_pool(identity, s, strides=s)
            identity = bn("downsample_bn")(
                conv(self.planes * expansion, 1, "downsample_conv")(identity))
        else:
            identity = x
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling (model/clip/model.py:56-93), mean-token query
    only (see module docstring)."""

    heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, output_dim)
        b, hh, ww, c = x.shape
        l = hh * ww
        tokens = x.reshape(b, l, c)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, L+1, C)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c ** -0.5), (l + 1, c))
        tokens = tokens + pos[None]

        def lin(name, out_dim):
            w = self.param(f"{name}_weight", nn.initializers.normal(0.02),
                           (out_dim, c))
            bb = self.param(f"{name}_bias", nn.initializers.zeros, (out_dim,))
            return w, bb

        qw, qb = lin("q_proj", c)
        kw, kb = lin("k_proj", c)
        vw, vb = lin("v_proj", c)
        cw, cb = lin("c_proj", self.output_dim)
        dh = c // self.heads
        q = (tokens[:, 0] @ qw.T + qb).reshape(b, self.heads, dh) * dh ** -0.5
        k = (tokens @ kw.T + kb).reshape(b, l + 1, self.heads, dh)
        v = (tokens @ vw.T + vb).reshape(b, l + 1, self.heads, dh)
        attn = jax.nn.softmax(jnp.einsum("bhd,blhd->bhl", q, k), axis=-1)
        ctx = jnp.einsum("bhl,blhd->bhd", attn, v).reshape(b, c)
        return ctx @ cw.T + cb


class ModifiedResNetTower(nn.Module):
    config: ClipResNetConfig = ClipResNetConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) float32 (normalized) -> (B, embed_dim)."""
        cfg = self.config
        w = cfg.width

        def conv(features, name, stride=1):
            return nn.Conv(features, (3, 3), strides=(stride, stride),
                           padding=((1, 1), (1, 1)), use_bias=False, name=name)

        def bn(name):
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                name=name)

        x = nn.relu(bn("bn1")(conv(w // 2, "conv1", stride=2)(images)))
        x = nn.relu(bn("bn2")(conv(w // 2, "conv2")(x)))
        x = nn.relu(bn("bn3")(conv(w, "conv3")(x)))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        for stage, (mult, blocks) in enumerate(
                zip((1, 2, 4, 8), cfg.layers), start=1):
            for blk in range(blocks):
                stride = 2 if (stage > 1 and blk == 0) else 1
                x = Bottleneck(w * mult, stride,
                               name=f"layer{stage}_{blk}")(x)
        return AttentionPool2d(cfg.heads, cfg.embed_dim, name="attnpool")(x)


# ---------------------------------------------------------------------------
# torch weight import
# ---------------------------------------------------------------------------

def _np(t):
    x = t.detach().cpu() if hasattr(t, "detach") else t
    return np.asarray(x, dtype=np.float32)


def _conv(sd: Dict, key: str) -> Dict:
    return {"kernel": _np(sd[key]).transpose(2, 3, 1, 0)}  # OIHW -> HWIO


def _bn(sd: Dict, key: str):
    params = {"scale": _np(sd[key + ".weight"]), "bias": _np(sd[key + ".bias"])}
    stats = {"mean": _np(sd[key + ".running_mean"]),
             "var": _np(sd[key + ".running_var"])}
    return params, stats


def import_resnet_tower(
    sd: Dict, config: ClipResNetConfig, prefix: str = "visual."
) -> Dict:
    """Torch CLIP state dict -> flax variables ({'params', 'batch_stats'})
    for :class:`ModifiedResNetTower`."""
    p = prefix
    params: Dict = {}
    stats: Dict = {}
    for name in ("conv1", "conv2", "conv3"):
        params[name] = _conv(sd, f"{p}{name}.weight")
    for name in ("bn1", "bn2", "bn3"):
        params[name], stats[name] = _bn(sd, f"{p}{name}")

    for stage, blocks in enumerate(config.layers, start=1):
        for blk in range(blocks):
            tp = f"{p}layer{stage}.{blk}."
            bp: Dict = {}
            bs: Dict = {}
            for name in ("conv1", "conv2", "conv3"):
                bp[name] = _conv(sd, f"{tp}{name}.weight")
            for name in ("bn1", "bn2", "bn3"):
                bp[name], bs[name] = _bn(sd, f"{tp}{name}")
            if f"{tp}downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{tp}downsample.0.weight")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{tp}downsample.1")
            params[f"layer{stage}_{blk}"] = bp
            stats[f"layer{stage}_{blk}"] = bs

    ap = f"{p}attnpool."
    pool = {"positional_embedding": _np(sd[ap + "positional_embedding"])}
    for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
        pool[f"{name}_weight"] = _np(sd[f"{ap}{name}.weight"])
        pool[f"{name}_bias"] = _np(sd[f"{ap}{name}.bias"])
    params["attnpool"] = pool
    return {"params": params, "batch_stats": stats}
