"""CLIP text and vision towers in flax, with a torch-state-dict importer.

Architecture targets the reference's vendored OpenAI CLIP
(``model/clip/model.py:10-375``): pre-LN transformer blocks with
QuickGELU, causal masking + EOT pooling for text, ViT patch embedding +
class token for vision. Parameters are stored in torch layout names so
published checkpoints (OpenAI weights, StrongCLIP fine-tunes) import with
transposes only.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    heads: int = 12
    layers: int = 12
    embed_dim: int = 512


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):  # (B, L, W)
        d = self.width
        h = self.heads
        dh = d // h
        y = nn.LayerNorm(name="ln_1", epsilon=1e-5)(x)
        in_proj_w = self.param("attn_in_proj_weight",
                               nn.initializers.normal(0.02), (3 * d, d))
        in_proj_b = self.param("attn_in_proj_bias", nn.initializers.zeros, (3 * d,))
        q = y @ in_proj_w[:d].T + in_proj_b[:d]
        k = y @ in_proj_w[d:2 * d].T + in_proj_b[d:2 * d]
        v = y @ in_proj_w[2 * d:].T + in_proj_b[2 * d:]
        b, l, _ = y.shape
        q = q.reshape(b, l, h, dh).transpose(0, 2, 1, 3) * (dh ** -0.5)
        k = k.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhld,bhmd->bhlm", q, k)
        if self.causal:
            mask = jnp.triu(jnp.full((l, l), -jnp.inf), k=1)
            attn = attn + mask[None, None]
        attn = jax.nn.softmax(attn, axis=-1)
        ctx = jnp.einsum("bhlm,bhmd->bhld", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
        out_w = self.param("attn_out_proj_weight",
                           nn.initializers.normal(0.02), (d, d))
        out_b = self.param("attn_out_proj_bias", nn.initializers.zeros, (d,))
        x = x + ctx @ out_w.T + out_b

        y = nn.LayerNorm(name="ln_2", epsilon=1e-5)(x)
        fc_w = self.param("mlp_c_fc_weight", nn.initializers.normal(0.02), (4 * d, d))
        fc_b = self.param("mlp_c_fc_bias", nn.initializers.zeros, (4 * d,))
        pr_w = self.param("mlp_c_proj_weight", nn.initializers.normal(0.02), (d, 4 * d))
        pr_b = self.param("mlp_c_proj_bias", nn.initializers.zeros, (d,))
        x = x + quick_gelu(y @ fc_w.T + fc_b) @ pr_w.T + pr_b
        return x


class ClipTextTower(nn.Module):
    config: ClipTextConfig = ClipTextConfig()

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, 77) int32 -> (B, embed_dim) text features (EOT pooling)."""
        cfg = self.config
        tok = self.param("token_embedding",
                         nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.width))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width))
        x = tok[token_ids] + pos[None, : token_ids.shape[1]]
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(
                cfg.width, cfg.heads, causal=True, name=f"block_{i}"
            )(x)
        x = nn.LayerNorm(name="ln_final", epsilon=1e-5)(x)
        # EOT token = highest token id per sequence (reference model.py:354)
        eot_idx = jnp.argmax(token_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (cfg.width, cfg.embed_dim))
        return pooled @ proj


class ClipVisionTower(nn.Module):
    config: ClipVisionConfig = ClipVisionConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) float32 (normalized) -> (B, embed_dim)."""
        cfg = self.config
        x = nn.Conv(
            cfg.width, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            name="conv1",
        )(images)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls[None, None], (b, 1, cfg.width)), x],
                            axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (n_pos, cfg.width))
        x = x + pos[None]
        x = nn.LayerNorm(name="ln_pre", epsilon=1e-5)(x)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.width, cfg.heads, name=f"block_{i}")(x)
        x = nn.LayerNorm(name="ln_post", epsilon=1e-5)(x[:, 0:1])[:, 0]
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (cfg.width, cfg.embed_dim))
        return x @ proj


# ---------------------------------------------------------------------------
# torch weight import
# ---------------------------------------------------------------------------

def _np(t):
    x = t.detach().cpu() if hasattr(t, "detach") else t
    return np.asarray(x, dtype=np.float32)


def _import_block(sd: Dict, prefix: str) -> Dict:
    return {
        "ln_1": {"scale": _np(sd[prefix + "ln_1.weight"]),
                 "bias": _np(sd[prefix + "ln_1.bias"])},
        "ln_2": {"scale": _np(sd[prefix + "ln_2.weight"]),
                 "bias": _np(sd[prefix + "ln_2.bias"])},
        "attn_in_proj_weight": _np(sd[prefix + "attn.in_proj_weight"]),
        "attn_in_proj_bias": _np(sd[prefix + "attn.in_proj_bias"]),
        "attn_out_proj_weight": _np(sd[prefix + "attn.out_proj.weight"]),
        "attn_out_proj_bias": _np(sd[prefix + "attn.out_proj.bias"]),
        "mlp_c_fc_weight": _np(sd[prefix + "mlp.c_fc.weight"]),
        "mlp_c_fc_bias": _np(sd[prefix + "mlp.c_fc.bias"]),
        "mlp_c_proj_weight": _np(sd[prefix + "mlp.c_proj.weight"]),
        "mlp_c_proj_bias": _np(sd[prefix + "mlp.c_proj.bias"]),
    }


def import_text_tower(sd: Dict, layers: int = 12, prefix: str = "") -> Dict:
    """OpenAI CLIP state dict -> ClipTextTower params. ``prefix`` handles
    wrapped checkpoints (e.g. 'ClipModel.')."""
    p = prefix
    params = {
        "token_embedding": _np(sd[p + "token_embedding.weight"]),
        "positional_embedding": _np(sd[p + "positional_embedding"]),
        "ln_final": {"scale": _np(sd[p + "ln_final.weight"]),
                     "bias": _np(sd[p + "ln_final.bias"])},
        "text_projection": _np(sd[p + "text_projection"]),
    }
    for i in range(layers):
        params[f"block_{i}"] = _import_block(sd, f"{p}transformer.resblocks.{i}.")
    return params


def import_vision_tower(sd: Dict, layers: int = 12, prefix: str = "visual.") -> Dict:
    p = prefix
    conv_w = _np(sd[p + "conv1.weight"])  # (width, 3, P, P) torch OIHW
    params = {
        "conv1": {"kernel": conv_w.transpose(2, 3, 1, 0)},  # HWIO
        "class_embedding": _np(sd[p + "class_embedding"]),
        "positional_embedding": _np(sd[p + "positional_embedding"]),
        "ln_pre": {"scale": _np(sd[p + "ln_pre.weight"]),
                   "bias": _np(sd[p + "ln_pre.bias"])},
        "ln_post": {"scale": _np(sd[p + "ln_post.weight"]),
                    "bias": _np(sd[p + "ln_post.bias"])},
        "proj": _np(sd[p + "proj"]),
    }
    for i in range(layers):
        params[f"block_{i}"] = _import_block(sd, f"{p}transformer.resblocks.{i}.")
    return params


# ---------------------------------------------------------------------------
# architecture inference from state-dict shapes (reference build_model,
# model/clip/model.py:401-438)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ClipArch:
    """What a CLIP checkpoint's weight shapes say it is. ``vision`` is
    None for text-only dumps (e.g. StrongCLIP text-tower fine-tunes)."""
    text: ClipTextConfig
    vision: object  # ClipVisionConfig (ViT), ClipResNetConfig, or None
    vit: bool


def infer_clip_config(sd: Dict, prefix: str = "") -> ClipArch:
    """Infer the full CLIP architecture from weight shapes alone, exactly
    as the reference ``build_model`` does (model/clip/model.py:401-438) —
    so any released checkpoint (ViT-B/32, ViT-B/16, ViT-L/14, RN50,
    RN50x4, RN101, ...) loads without a hand-written config. ``prefix``
    handles wrapped checkpoints (e.g. 'ClipModel.')."""
    from .resnet import ClipResNetConfig

    p = prefix
    keys = [k[len(p):] for k in sd if k.startswith(p)]

    def shape(k):
        return tuple(sd[p + k].shape)

    embed_dim = shape("text_projection")[1]
    width = shape("ln_final.weight")[0]
    text = ClipTextConfig(
        vocab_size=shape("token_embedding.weight")[0],
        context_length=shape("positional_embedding")[0],
        width=width,
        heads=width // 64,
        layers=len({k.split(".")[2] for k in keys
                    if k.startswith("transformer.resblocks")}),
        embed_dim=embed_dim,
    )

    vit = "visual.proj" in keys
    if not any(k.startswith("visual.") for k in keys):
        return ClipArch(text=text, vision=None, vit=False)
    if vit:
        vision_width = shape("visual.conv1.weight")[0]
        vision_layers = len([k for k in keys if k.startswith("visual.")
                             and k.endswith(".attn.in_proj_weight")])
        patch = shape("visual.conv1.weight")[-1]
        grid = round((shape("visual.positional_embedding")[0] - 1) ** 0.5)
        vision = ClipVisionConfig(
            image_size=patch * grid, patch_size=patch, width=vision_width,
            heads=vision_width // 64, layers=vision_layers,
            embed_dim=embed_dim,
        )
    else:
        counts = tuple(
            len({k.split(".")[2] for k in keys
                 if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        )
        vision_width = shape("visual.layer1.0.conv1.weight")[0]
        out_width = round(
            (shape("visual.attnpool.positional_embedding")[0] - 1) ** 0.5)
        assert out_width ** 2 + 1 == \
            shape("visual.attnpool.positional_embedding")[0]
        vision = ClipResNetConfig(
            layers=counts, width=vision_width,
            heads=vision_width * 32 // 64,
            image_size=out_width * 32, embed_dim=embed_dim,
        )
    return ClipArch(text=text, vision=vision, vit=vit)


def build_towers(sd: Dict, prefix: str = ""):
    """Reference ``build_model`` analog: infer the architecture from the
    state dict, instantiate both flax towers, import the weights.

    Returns ``(text_tower, text_vars, vision_tower, vision_vars)`` where
    each vars dict is ready for ``tower.apply(vars, batch)`` (ResNet
    towers carry a 'batch_stats' collection for the frozen BN)."""
    from .resnet import ModifiedResNetTower, import_resnet_tower

    arch = infer_clip_config(sd, prefix=prefix)
    text_tower = ClipTextTower(arch.text)
    text_vars = {"params": import_text_tower(sd, layers=arch.text.layers,
                                             prefix=prefix)}
    if arch.vision is None:
        return text_tower, text_vars, None, None
    if arch.vit:
        vision_tower = ClipVisionTower(arch.vision)
        vision_vars = {"params": import_vision_tower(
            sd, layers=arch.vision.layers, prefix=prefix + "visual.")}
    else:
        vision_tower = ModifiedResNetTower(arch.vision)
        vision_vars = import_resnet_tower(sd, arch.vision,
                                          prefix=prefix + "visual.")
    return text_tower, text_vars, vision_tower, vision_vars
