"""End2EndClip: raw video frames + raw text through live CLIP towers
(reference ``model/model.py:2261-2498``).

The model embeds S sampled frames per video through the ViT tower, mean-
pools them (the reference's only supported frame_agg_method), embeds the
caption through the text tower, and trains with the improved-triplet loss.
Frozen-tower mode (clip_opt['frozen']) stops gradients into CLIP, matching
the reference's torch.no_grad() blocks; the reference's lr/20 rule for
CLIP parameters is implemented in the trainer via an optax label mask.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .clip.towers import ClipTextConfig, ClipTextTower, ClipVisionConfig, ClipVisionTower


class End2EndClip(nn.Module):
    text_config: ClipTextConfig = ClipTextConfig()
    vision_config: ClipVisionConfig = ClipVisionConfig()
    frozen: bool = True

    def setup(self):
        self.text_tower = ClipTextTower(self.text_config, name="clip_text")
        self.vision_tower = ClipVisionTower(self.vision_config, name="clip_vision")

    def encode_txt(self, inputs: Dict[str, jnp.ndarray], train: bool = False):
        feats = self.text_tower(inputs["clip_ids"])
        if self.frozen:
            feats = jax.lax.stop_gradient(feats)
        return feats

    def encode_vis(self, inputs: Dict[str, jnp.ndarray], train: bool = False):
        frames = inputs["frames"]  # (B, S, H, W, 3)
        b, s = frames.shape[:2]
        flat = frames.reshape((b * s,) + frames.shape[2:])
        feats = self.vision_tower(flat).reshape(b, s, -1)
        if self.frozen:
            feats = jax.lax.stop_gradient(feats)
        mask = inputs.get("frames_mask")  # (B, S) optional
        if mask is None:
            return jnp.mean(feats, axis=1)
        m = mask.astype(feats.dtype)
        return jnp.sum(feats * m[:, :, None], axis=1) / jnp.clip(
            jnp.sum(m, axis=1, keepdims=True), min=1.0
        )

    def __call__(self, txt_inputs, vis_inputs, train: bool = False):
        return (
            self.encode_txt(txt_inputs, train=train),
            self.encode_vis(vis_inputs, train=train),
        )


def clip_param_labels(params) -> Dict:
    """optax label tree: 'clip' for tower params (lr/20 in the reference,
    model/model.py:2013-2019), 'usual' otherwise."""
    def label(path, _):
        keys = [getattr(p, "key", "") for p in path]
        if any(k in ("clip_text", "clip_vision") or "ClipModel" in str(k) for k in keys):
            return "clip"
        return "usual"

    return jax.tree_util.tree_map_with_path(label, params)
