"""End-to-end LAFF model: towers, jit-compiled forward, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laff_tpu.models import (
    AttentionSpec,
    GruSpec,
    LAFFModel,
    LAFFSpec,
    TowerSpec,
)
from laff_tpu.ops import triplet_loss_multi_space


def laff_ml_spec(heads=4, common=64):
    """Miniature LAFF-ml: bow+w2v+gru+clip text, 4 video features."""
    txt = TowerSpec(
        features=(("rnn", 16), ("bow", 30), ("w2v", 10), ("clip", 12)),
        common_dim=common,
        attention=AttentionSpec(
            kind="Multi_head_MyApply_Attention", heads=heads,
            with_ave=False, mul=False, split_head=True,
        ),
        gru=GruSpec(vocab_size=25, we_dim=8, rnn_size=16, pooling="mean"),
        batch_norm=True,
    )
    vis = TowerSpec(
        features=(("clip_ft", 12), ("x3d", 20), ("ircsn", 24), ("tf", 28)),
        common_dim=common,
        attention=AttentionSpec(
            kind="Multi_head_MyApply_Attention", heads=heads,
            with_ave=False, mul=False, split_head=True,
        ),
        batch_norm=True,
    )
    return LAFFSpec(txt=txt, vis=vis)


def make_batch(rng, b=6):
    txt = {
        "rnn_ids": rng.integers(0, 25, (b, 9)).astype(np.int32),
        "rnn_len": rng.integers(2, 9, (b,)).astype(np.int32),
        "bow": rng.standard_normal((b, 30)).astype(np.float32),
        "w2v": rng.standard_normal((b, 10)).astype(np.float32),
        "clip": rng.standard_normal((b, 12)).astype(np.float32),
    }
    vis = {
        "clip_ft": rng.standard_normal((b, 12)).astype(np.float32),
        "x3d": rng.standard_normal((b, 20)).astype(np.float32),
        "ircsn": rng.standard_normal((b, 24)).astype(np.float32),
        "tf": rng.standard_normal((b, 28)).astype(np.float32),
    }
    return {k: jnp.asarray(v) for k, v in txt.items()}, {
        k: jnp.asarray(v) for k, v in vis.items()
    }


def test_laff_ml_forward_shapes(rng):
    spec = laff_ml_spec()
    model = LAFFModel(spec)
    txt, vis = make_batch(rng)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, txt, vis
    )
    t_emb, v_emb = model.apply(variables, txt, vis)
    assert t_emb.shape == (6, 4, 16)
    assert v_emb.shape == (6, 4, 16)
    # per-head unit norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(t_emb), axis=-1), 1.0, rtol=1e-4
    )


def test_laff_ml_train_step_gradients(rng):
    spec = laff_ml_spec()
    model = LAFFModel(spec)
    txt, vis = make_batch(rng)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, txt, vis
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    schedule = variables.get("schedule", {})

    @jax.jit
    def loss_fn(params):
        (t_emb, v_emb), updates = model.apply(
            {
                "params": params,
                "batch_stats": batch_stats,
                "schedule": schedule,
            },
            txt, vis, train=True,
            rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats"],
        )
        return triplet_loss_multi_space(t_emb, v_emb)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradient reaches every tower parameter family
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    nonzero = {
        jax.tree_util.keystr(path)
        for path, g in flat
        if float(jnp.abs(g).sum()) > 0
    }
    assert any("txt_net" in k and "gate_kernel" in k for k in nonzero)
    assert any("vis_net" in k and "fc1" in k for k in nonzero)
    assert any("gru" in k for k in nonzero)


def test_no_transform_passthrough(rng):
    """A no_transform feature is tiled heads times and BN'd, no fc."""
    heads, d = 4, 16
    vis = TowerSpec(
        features=(("clip_ft", d),),
        common_dim=heads * d,
        attention=AttentionSpec(kind="Multi_head_MyApply_Attention", heads=heads),
        no_transform=("clip_ft",),
    )
    txt = TowerSpec(
        features=(("bow", 8),),
        common_dim=heads * d,
        attention=AttentionSpec(kind="Multi_head_MyApply_Attention", heads=heads),
    )
    model = LAFFModel(LAFFSpec(txt=txt, vis=vis))
    tb = {"bow": jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))}
    vb = {"clip_ft": jnp.asarray(rng.standard_normal((3, d)).astype(np.float32))}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, tb, vb
    )
    # vis tower must have no fc for clip_ft
    assert "fc1" not in variables["params"]["vis_net"]["transform_clip_ft"]
    t_emb, v_emb = model.apply(variables, tb, vb)
    assert v_emb.shape == (3, heads, d)


def test_frame_laff_two_level_fusion(rng):
    """FrameLAFF: frame-axis attention pooling feeds feature-level fusion."""
    heads = 2
    vis = TowerSpec(
        features=(("mean_clip", 12),),
        common_dim=32,
        attention=AttentionSpec(
            kind="Multi_head_MyApply_Attention", heads=heads, with_ave=False
        ),
        frame_features=(("clip_frames", 12),),
        frame_attention=AttentionSpec(
            kind="attention_noAveNoAverageMul", heads=1
        ),
        frame_feat_with_video_feat=True,
    )
    txt = TowerSpec(
        features=(("bow", 8),),
        common_dim=32,
        attention=AttentionSpec(
            kind="Multi_head_MyApply_Attention", heads=heads, with_ave=False
        ),
    )
    model = LAFFModel(LAFFSpec(txt=txt, vis=vis))
    b, t = 3, 5
    tb = {"bow": jnp.asarray(rng.standard_normal((b, 8)).astype(np.float32))}
    vb = {
        "mean_clip": jnp.asarray(rng.standard_normal((b, 12)).astype(np.float32)),
        "clip_frames@frames": jnp.asarray(
            rng.standard_normal((b, t, 12)).astype(np.float32)
        ),
        "clip_frames@mask": jnp.asarray(
            np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1], [1, 0, 0, 0, 0]], np.float32)
        ),
    }
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, tb, vb
    )
    t_emb, v_emb = model.apply(variables, tb, vb)
    assert v_emb.shape == (b, heads, 16)

    # padding frames must not affect the result
    vb2 = dict(vb)
    frames = np.asarray(vb["clip_frames@frames"]).copy()
    frames[0, 3:] = 123.0  # padded region of sample 0
    vb2["clip_frames@frames"] = jnp.asarray(frames)
    t2, v2 = model.apply(variables, tb, vb2)
    np.testing.assert_allclose(np.asarray(v_emb), np.asarray(v2), rtol=1e-5)


def test_concat_tower(rng):
    """'concat' attention reproduces the W2VVPP concat-then-project path."""
    txt = TowerSpec(
        features=(("bow", 8), ("w2v", 6)),
        common_dim=24,
        attention=AttentionSpec(kind="concat"),
    )
    vis = TowerSpec(
        features=(("f1", 10), ("f2", 12)),
        common_dim=24,
        attention=AttentionSpec(kind="concat"),
    )
    model = LAFFModel(LAFFSpec(txt=txt, vis=vis))
    tb = {
        "bow": jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32)),
        "w2v": jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32)),
    }
    vb = {
        "f1": jnp.asarray(rng.standard_normal((4, 10)).astype(np.float32)),
        "f2": jnp.asarray(rng.standard_normal((4, 12)).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, tb, vb
    )
    t_emb, v_emb = model.apply(variables, tb, vb)
    assert t_emb.shape == (4, 24)
    assert v_emb.shape == (4, 24)


def test_bfloat16_compute_path(rng):
    """compute_dtype='bfloat16': params stay f32, outputs f32, numerics
    close to the f32 tower (the reference float16/AMP flag equivalent)."""
    import dataclasses

    import jax

    spec32 = laff_ml_spec()
    spec16 = dataclasses.replace(
        spec32,
        txt=dataclasses.replace(spec32.txt, compute_dtype="bfloat16"),
        vis=dataclasses.replace(spec32.vis, compute_dtype="bfloat16"),
    )
    txt, vis = make_batch(rng)
    m32, m16 = LAFFModel(spec32), LAFFModel(spec16)
    v32 = m32.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, txt, vis)
    t32, e32 = m32.apply(v32, txt, vis)
    t16, e16 = m16.apply(v32, txt, vis)  # same params
    assert t16.dtype == jnp.float32
    # params unchanged dtype
    assert all(
        l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(v32["params"])
    )
    # bf16 towers track the f32 result
    np.testing.assert_allclose(np.asarray(t16), np.asarray(t32), atol=0.08)
    np.testing.assert_allclose(np.asarray(e16), np.asarray(e32), atol=0.08)


def test_attention_weight_introspection(rng):
    from laff_tpu.models.laff import get_attention_weights

    spec = laff_ml_spec()
    model = LAFFModel(spec)
    txt, vis = make_batch(rng)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, txt, vis
    )
    w = get_attention_weights(model, variables, txt, side="txt")
    assert w.shape == (6, 4, 4)  # (B, L, H)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)  # softmax over L
    wv = get_attention_weights(model, variables, vis, side="vis")
    assert wv.shape == (6, 4, 4)


def test_tied_cross_tower_transform(rng):
    """txt_fc_same_with_vis_fc: the tied pair shares ONE TransformNet —
    same params produce identical projections in both towers, gradients
    from both sides flow into it, and mismatched dims raise (reference
    model/model.py:764-768; the multi-head variant's swap at 1956-1963 is
    a silent no-op we fix)."""
    import laff_tpu.ops as ops
    from laff_tpu.models import AttentionSpec, LAFFSpec, TowerSpec

    attn = AttentionSpec(kind="Multi_head_MyApply_Attention", heads=2,
                         with_ave=False)
    spec = LAFFSpec(
        txt=TowerSpec(features=(("bow", 16), ("clip", 12)), common_dim=32,
                      attention=attn),
        vis=TowerSpec(features=(("f1", 10), ("clipvid", 12)), common_dim=32,
                      attention=attn),
        tied_transforms=(("clip", "clipvid"),),
    )
    model = LAFFModel(spec)
    txt = {"bow": jnp.asarray(rng.standard_normal((4, 16)), jnp.float32),
           "clip": jnp.asarray(rng.standard_normal((4, 12)), jnp.float32)}
    vis = {"f1": jnp.asarray(rng.standard_normal((4, 10)), jnp.float32),
           "clipvid": txt["clip"]}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, txt, vis
    )
    params = variables["params"]
    assert "tied_fc_clip_clipvid" in params
    # neither tower owns a private fc for the tied pair
    assert "fc1" not in params["txt_net"].get("transform_clip", {})
    assert "fc1" not in params["vis_net"].get("transform_clipvid", {})
    # the shared projection maps identical inputs identically in both towers
    k = params["tied_fc_clip_clipvid"]["kernel"]
    assert k.shape == (12, 32)

    def loss(p):
        t, v = model.apply({"params": p}, txt, vis)
        return ops.triplet_loss_multi_space(t, v)

    g = jax.grad(loss)(params)
    gn = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        g["tied_fc_clip_clipvid"], 0.0,
    )
    assert gn > 0  # both towers backprop into the shared transform

    bad = LAFFSpec(
        txt=spec.txt,
        vis=TowerSpec(features=(("f1", 10), ("clipvid", 13)), common_dim=32,
                      attention=attn),
        tied_transforms=(("clip", "clipvid"),),
    )
    with pytest.raises(ValueError, match="do not match"):
        LAFFModel(bad).init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            txt, {"f1": vis["f1"], "clipvid": jnp.zeros((4, 13))},
        )
