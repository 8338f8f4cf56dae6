"""Sharded similarity engine + data-parallel training on the 8-device
virtual CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laff_tpu.eval import ranks_from_scores_device
from laff_tpu.ops import multi_head_cosine_sim
from laff_tpu.ops.pallas_kernels import flatten_heads
from laff_tpu.parallel import data_parallel_mesh, shard_batch
from laff_tpu.parallel.sim_engine import sharded_t2v_ranks, sharded_topk


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return data_parallel_mesh(8)


def test_sharded_ranks_match_single_device(rng, mesh):
    t, v, h, d = 40, 203, 2, 16  # v deliberately not divisible by 8
    txt = jnp.asarray(rng.standard_normal((t, h, d)).astype(np.float32))
    vis = jnp.asarray(rng.standard_normal((v, h, d)).astype(np.float32))
    gt = jnp.asarray(rng.integers(0, v, (t,)).astype(np.int32))

    sharded = sharded_t2v_ranks(txt, vis, gt, mesh)

    tn = flatten_heads(txt)
    vn = flatten_heads(vis)
    scores = jnp.dot(tn, vn.T, preferred_element_type=jnp.float32)
    expected = np.asarray(ranks_from_scores_device(scores, gt))
    np.testing.assert_array_equal(sharded, expected)


def test_sharded_topk_matches_global(rng, mesh):
    t, v, h, d = 10, 160, 2, 16
    txt = jnp.asarray(rng.standard_normal((t, h, d)).astype(np.float32))
    vis = jnp.asarray(rng.standard_normal((v, h, d)).astype(np.float32))
    k = 12

    vals, idx = sharded_topk(txt, vis, k, mesh)
    assert vals.shape == (t, k) and idx.shape == (t, k)

    scores = np.asarray(
        flatten_heads(txt) @ flatten_heads(vis).T
    )
    for q in range(t):
        expected_idx = np.argsort(scores[q])[::-1][:k]
        np.testing.assert_allclose(
            np.sort(vals[q])[::-1], np.sort(scores[q][expected_idx])[::-1],
            rtol=1e-5,
        )
        assert set(idx[q]) == set(expected_idx)


def test_sharded_int8_topk_matches_dense_int8(rng, mesh):
    """sharded_int8_topk == dense int8 nomination (same quantization, so
    the sharded mechanics — padding, masking, gather/merge — are exact),
    and the int8 cut nominates the true exact top-k at 1.5x margin."""
    from laff_tpu.ops.quantized import int8_scores, quantize_rows
    from laff_tpu.parallel.sim_engine import sharded_int8_topk

    t, v, h, d = 12, 203, 2, 16  # v deliberately not divisible by 8
    txt = jnp.asarray(rng.standard_normal((t, h, d)).astype(np.float32))
    vis = jnp.asarray(rng.standard_normal((v, h, d)).astype(np.float32))
    k = 15

    vn = flatten_heads(vis)
    vq, vscale = quantize_rows(vn)
    vals, idx = sharded_int8_topk(txt, vq, vscale, k, mesh)
    assert vals.shape == (t, k) and idx.shape == (t, k)

    tn = flatten_heads(txt)
    tq, tscale = quantize_rows(tn)
    dense = np.asarray(int8_scores(tq, tscale, vq, vscale))
    exact = np.asarray(tn @ vn.T)
    for q in range(t):
        expected = np.argsort(dense[q])[::-1][:k]
        assert set(idx[q]) == set(expected)
        np.testing.assert_allclose(
            np.sort(vals[q])[::-1], np.sort(dense[q][expected])[::-1],
            rtol=1e-6,
        )
        # serving guarantee: the 1.5x-margin int8 cut covers the exact
        # top-10 (what int8_streaming_topk rescores downstream)
        exact_top10 = set(np.argsort(exact[q])[::-1][:10])
        assert exact_top10 <= set(idx[q])


def test_sharded_train_step_matches_single_device(rng, mesh):
    """Data-parallel gradient step == single-device step on the same batch
    (GSPMD all-gathers the in-batch negatives)."""
    from laff_tpu.models import AttentionSpec, LAFFModel, LAFFSpec, TowerSpec
    from laff_tpu.ops import triplet_loss_multi_space

    spec = LAFFSpec(
        txt=TowerSpec(
            features=(("bow", 16),), common_dim=32,
            attention=AttentionSpec(kind="Multi_head_MyApply_Attention",
                                    heads=2, with_ave=False),
        ),
        vis=TowerSpec(
            features=(("f1", 12),), common_dim=32,
            attention=AttentionSpec(kind="Multi_head_MyApply_Attention",
                                    heads=2, with_ave=False),
        ),
    )
    model = LAFFModel(spec)
    b = 32
    txt = {"bow": jnp.asarray(rng.standard_normal((b, 16)).astype(np.float32))}
    vis = {"f1": jnp.asarray(rng.standard_normal((b, 12)).astype(np.float32))}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, txt, vis
    )

    def loss_fn(params, txt, vis):
        t, v = model.apply({"params": params}, txt, vis)
        return triplet_loss_multi_space(t, v)

    grad_fn = jax.jit(jax.grad(loss_fn))
    g_single = grad_fn(variables["params"], txt, vis)

    txt_sharded = shard_batch(txt, mesh)
    vis_sharded = shard_batch(vis, mesh)
    g_sharded = grad_fn(variables["params"], txt_sharded, vis_sharded)

    for a, b_ in zip(jax.tree_util.tree_leaves(g_single),
                     jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_trainer_main_with_mesh(tmp_path, mesh):
    """Full trainer.main with a data-parallel mesh: batches shard over dp,
    training converges identically in character to single-device."""
    from helpers import build_collection, build_w2v
    from laff_tpu.engine import Options
    from laff_tpu.engine.trainer import main

    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=32, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=16, caps_per_video=1, seed=5)
    build_w2v(root)
    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny", num_epochs=3, batch_size=16,
        model_prefix="mesh_run", metric="mir",
    )
    result = main(opt, mesh=mesh)
    assert result["best_perf"] > 0.2, result


def test_initialize_multihost_noop_single_process():
    """Without a coordinator env, initialize_multihost is a no-op and
    reports one process; shard_batch keeps its single-host device_put path."""
    import jax

    from laff_tpu.parallel import initialize_multihost

    assert initialize_multihost() == 1
    assert jax.process_count() == 1


def test_trainer_mesh_with_transfer_optimizations(tmp_path, mesh):
    """The transfer optimizations compose with a data-parallel mesh:
    device feature cache (replicated HBM cache + dp-sharded row indices),
    multi-step scan (stacks sharded on the per-step batch axis), and
    device-side text featurization — training reaches the same quality
    band as the plain mesh run."""
    from helpers import build_collection, build_w2v
    from laff_tpu.engine import Options
    from laff_tpu.engine.trainer import main

    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=32, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=16, caps_per_video=1, seed=5)
    build_w2v(root)
    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny", num_epochs=3, batch_size=16,
        model_prefix="mesh_opt_run", metric="mir",
        device_feature_cache=1, device_text_featurize=1,
        steps_per_dispatch=2,
    )
    result = main(opt, mesh=mesh)
    assert result["best_perf"] > 0.2, result


def test_trainer_mesh_with_task2(tmp_path, mesh):
    """task2 concept labels ride the vis batch; under a dp mesh they shard
    on the batch axis like every other per-video array, and the concept
    heads' BCE/triplet terms reduce over the global batch via GSPMD."""
    import os

    from helpers import build_collection, build_w2v
    from laff_tpu.engine import Options
    from laff_tpu.engine.trainer import main

    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=32, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=16, caps_per_video=1, seed=5)
    build_w2v(root)
    cap = os.path.join(root, "toytrain", "TextData", "toytrain.caption.txt")
    objs = {}
    with open(cap) as fh:
        for line in fh:
            cap_id, caption = line.strip().split(" ", 1)
            objs.setdefault(cap_id.split("#")[0],
                            " ".join(caption.split()[1:]))
    with open(os.path.join(root, "toytrain", "TextData",
                           "toytrain.caption.obj.txt"), "w") as fh:
        fh.write("\n".join(f"{v} {w}" for v, w in objs.items()))
    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny", num_epochs=3, batch_size=16,
        model_prefix="mesh_t2", metric="mir",
        task2_caption="obj", task2_intended=1,
    )
    result = main(opt, mesh=mesh)
    assert result["best_perf"] > 0.2, result


def test_predictor_data_parallel_matches_single(tmp_path, mesh):
    """--data_parallel predict: eval batches shard over the mesh; metrics
    equal the single-device run."""
    from helpers import build_collection, build_w2v
    from laff_tpu.engine import Options
    from laff_tpu.engine.predictor import PredictOptions, main as predict_main
    from laff_tpu.engine.trainer import main as train_main

    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=32, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=16, caps_per_video=1, seed=5)
    build_collection(root, "toytest", n_videos=16, caps_per_video=2, seed=9)
    build_w2v(root)
    opt = Options(
        trainCollection="toytrain", valCollection="toyval", rootpath=root,
        val_set="no", config_name="tiny", num_epochs=4, batch_size=16,
        model_prefix="dp_pred", metric="mir",
    )
    result = train_main(opt)
    model_path = os.path.join(result["model_path"], "model_best.pth.tar")

    def run(sim_name, dp):
        popt = PredictOptions(
            testCollection="toytest", model_path=model_path,
            sim_name=sim_name, rootpath=root,
            query_sets="toytest.caption.txt",
            predict_result_file=os.path.join(root, "result_log", "dp.txt"),
            batch_size=16, overwrite=1, data_parallel=dp,
        )
        return predict_main(popt)["toytest.caption.txt"]["t2v"]

    single = run("dp0", 0)
    sharded = run("dp8", 8)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)

    # streaming large-gallery metrics under the mesh: gallery blocks go
    # through the same shard_batch path as the cached embed
    import laff_tpu.engine.predictor as P

    try:
        P.LARGE_GALLERY, saved = 5, P.LARGE_GALLERY
        streamed = run("dp8_stream", 8)
    finally:
        P.LARGE_GALLERY = saved
    np.testing.assert_allclose(streamed, single, rtol=1e-5, atol=1e-6)


def test_do_trainer_cli_data_parallel(tmp_path):
    """do_trainer --data_parallel N builds the mesh and trains sharded."""
    import do_trainer
    from helpers import build_collection, build_w2v

    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=32, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=16, caps_per_video=1, seed=5)
    build_w2v(root)
    rc = do_trainer.main([
        "toytrain", "toyval", "--rootpath", root, "--val_set", "no",
        "--config_name", "tiny", "--num_epochs", "2", "--batch_size", "16",
        "--model_prefix", "cli_dp", "--data_parallel", "8",
        "--overwrite", "1",
    ])
    assert os.path.exists(os.path.join(
        root, "toytrain", "w2vvpp_train", "toyval", "tiny", "cli_dp",
        "model_best.pth.tar"))
