"""Batched multi-seed sweep training (engine/sweep.py): one vmapped
program must reproduce S independent trainer.main runs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import build_collection, build_w2v


@pytest.fixture
def world(tmp_path):
    root = str(tmp_path)
    build_collection(root, "toytrain", n_videos=24, caps_per_video=2, seed=0)
    build_collection(root, "toyval", n_videos=10, caps_per_video=1, seed=5)
    build_w2v(root)
    return root


def _params_allclose(a, b, rtol=2e-4, atol=2e-5):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(flat_b[path], np.float32),
            rtol=rtol, atol=atol, err_msg=jax.tree_util.keystr(path))


def test_sweep_matches_independent_runs(world):
    """sweep_main([s1, s2]) must track trainer.main(seed=s1) and
    trainer.main(seed=s2) run independently: same per-epoch validation
    trajectory and final weights to float rounding (vmapped matmuls may
    tile reductions differently, so bit-equality is not required)."""
    from laff_tpu.engine import Options
    from laff_tpu.engine.checkpoint import load_checkpoint
    from laff_tpu.engine.sweep import sweep_main
    from laff_tpu.engine.trainer import main as train_main

    seeds = [2, 7]
    singles = {}
    for s in seeds:
        opt = Options(trainCollection="toytrain", valCollection="toyval",
                      rootpath=world, val_set="no", config_name="tiny",
                      num_epochs=3, batch_size=8, random_seed=s,
                      model_prefix=f"single_seed_{s}")
        singles[s] = train_main(opt)

    opt = Options(trainCollection="toytrain", valCollection="toyval",
                  rootpath=world, val_set="no", config_name="tiny",
                  num_epochs=3, batch_size=8, model_prefix="batched")
    results = sweep_main(opt, seeds)

    assert len(results) == len(seeds)
    for i, s in enumerate(seeds):
        single, batched = singles[s], results[i]
        assert batched["model_path"].endswith(f"batched_seed_{s}")
        # identical validation trajectory (discrete ranks are robust to
        # float-rounding differences on this world)
        assert len(batched["history"]) == len(single["history"])
        for se, be in zip(single["history"], batched["history"]):
            assert se["epoch"] == be["epoch"]
            np.testing.assert_allclose(be["loss"], se["loss"], rtol=1e-3)
            for k in ("r1", "r5", "r10", "medr", "mir"):
                assert se[k] == be[k], (s, se["epoch"], k)
        np.testing.assert_allclose(batched["best_perf"],
                                   single["best_perf"], rtol=1e-6)

        ck_single = load_checkpoint(
            os.path.join(single["model_path"], "model_best.pth.tar"))
        ck_batched = load_checkpoint(
            os.path.join(batched["model_path"], "model_best.pth.tar"))
        assert ck_batched["epoch"] == ck_single["epoch"]
        _params_allclose(ck_batched["params"], ck_single["params"])
        # per-seed artifacts exist in single-run layout
        for fname in ("val_perf.txt", "val_perf_hist.txt"):
            assert os.path.exists(os.path.join(batched["model_path"], fname))


def test_sweep_checkpoints_serve_prediction(world):
    """A sweep-produced checkpoint goes through the standard predictor."""
    from laff_tpu.engine import Options
    from laff_tpu.engine.predictor import PredictOptions, main as predict_main
    from laff_tpu.engine.sweep import sweep_main

    build_collection(world, "toytest", n_videos=12, caps_per_video=1, seed=9)
    opt = Options(trainCollection="toytrain", valCollection="toyval",
                  rootpath=world, val_set="no", config_name="tiny",
                  num_epochs=2, batch_size=8, model_prefix="predict_me")
    results = sweep_main(opt, [3, 4])
    ckpt = os.path.join(results[1]["model_path"], "model_best.pth.tar")
    popt = PredictOptions(
        testCollection="toytest", model_path=ckpt, sim_name="sweep_sim",
        rootpath=world, overwrite=1, query_sets="toytest.caption.txt",
        batch_size=8,
    )
    out = predict_main(popt)
    assert "t2v" in out["toytest.caption.txt"]


def test_active_mask_freezes_stopped_seed(world):
    """A seed marked inactive must come out of a sweep step bit-identical
    while active seeds keep updating (early-stop isolation)."""
    from laff_tpu.engine import Options, prepare
    from laff_tpu.engine.sweep import make_sweep_step, stack_states
    from laff_tpu.engine.trainer import (
        init_state, make_optimizer, make_train_step,
    )
    from laff_tpu.models import LAFFModel

    opt = Options(trainCollection="toytrain", valCollection="toyval",
                  rootpath=world, val_set="no", config_name="tiny",
                  num_epochs=1, batch_size=8, model_prefix="mask_unit")
    prepared = prepare(opt)
    model = LAFFModel(prepared.spec)
    tx = make_optimizer(prepared.config, prepared.spec)
    stacked = stack_states(
        [init_state(model, prepared.spec, prepared, tx, seed=s)
         for s in (1, 2)])

    step = make_sweep_step(make_train_step(model, tx, prepared.spec))
    batch = next(iter(prepared.train_feed.epoch(0)))
    txt = {k: jnp.asarray(np.stack([v, v])) for k, v in batch["txt"].items()}
    vis = {k: jnp.asarray(np.stack([v, v])) for k, v in batch["vis"].items()}
    before = jax.tree_util.tree_map(np.asarray, stacked)
    new, losses = step(stacked, txt, vis, jax.random.key(0),
                       jnp.asarray([True, False]))
    after = jax.tree_util.tree_map(np.asarray, new)

    # seed 1 (inactive) frozen exactly; seed 0 moved
    for path, leaf in jax.tree_util.tree_leaves_with_path(after.params):
        old = dict(jax.tree_util.tree_leaves_with_path(before.params))[path]
        np.testing.assert_array_equal(np.asarray(leaf)[1], np.asarray(old)[1])
    moved = any(
        not np.array_equal(np.asarray(leaf)[0],
                           dict(jax.tree_util.tree_leaves_with_path(
                               before.params))[path][0])
        for path, leaf in jax.tree_util.tree_leaves_with_path(after.params))
    assert moved
    assert int(after.step[0]) == 1 and int(after.step[1]) == 0
    assert losses.shape == (2,)


def test_per_seed_learning_rates(world):
    """Per-seed lrs live in the stacked hyperparams; an lr-0 seed's params
    must not move while its sibling updates."""
    from laff_tpu.engine import Options, prepare
    from laff_tpu.engine.sweep import (
        make_sweep_step, set_learning_rates, stack_states,
    )
    from laff_tpu.engine.trainer import (
        init_state, make_optimizer, make_train_step,
    )
    from laff_tpu.models import LAFFModel

    opt = Options(trainCollection="toytrain", valCollection="toyval",
                  rootpath=world, val_set="no", config_name="tiny",
                  num_epochs=1, batch_size=8, model_prefix="lr_unit")
    prepared = prepare(opt)
    model = LAFFModel(prepared.spec)
    tx = make_optimizer(prepared.config, prepared.spec)
    stacked = stack_states(
        [init_state(model, prepared.spec, prepared, tx, seed=1)
         for _ in range(2)])
    stacked = set_learning_rates(stacked, [1e-3, 0.0])
    assert stacked.opt_state.hyperparams["learning_rate"].shape == (2,)

    step = make_sweep_step(make_train_step(model, tx, prepared.spec))
    batch = next(iter(prepared.train_feed.epoch(0)))
    txt = {k: jnp.asarray(np.stack([v, v])) for k, v in batch["txt"].items()}
    vis = {k: jnp.asarray(np.stack([v, v])) for k, v in batch["vis"].items()}
    before = jax.tree_util.tree_map(np.asarray, stacked.params)
    new, _ = step(stacked, txt, vis, jax.random.key(0),
                  jnp.asarray([True, True]))
    after = jax.tree_util.tree_map(np.asarray, new.params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(after):
        old = dict(jax.tree_util.tree_leaves_with_path(before))[path]
        np.testing.assert_array_equal(np.asarray(leaf)[1],
                                      np.asarray(old)[1],
                                      err_msg=jax.tree_util.keystr(path))
    moved = any(
        not np.array_equal(np.asarray(leaf)[0],
                           dict(jax.tree_util.tree_leaves_with_path(
                               before))[path][0])
        for path, leaf in jax.tree_util.tree_leaves_with_path(after))
    assert moved


def test_sweep_seed_axis_over_mesh(world):
    """sweep_main(mesh=...) shards the seed axis over 'dp' devices with no
    collectives; trajectories must match the unsharded sweep exactly
    (ranks are discrete; losses to float rounding)."""
    from laff_tpu.engine import Options
    from laff_tpu.engine.sweep import sweep_main
    from laff_tpu.parallel import data_parallel_mesh

    seeds = [11, 12, 13, 14]
    opt = Options(trainCollection="toytrain", valCollection="toyval",
                  rootpath=world, val_set="no", config_name="tiny",
                  num_epochs=2, batch_size=8, model_prefix="host_sweep")
    host = sweep_main(opt, seeds)

    opt = Options(trainCollection="toytrain", valCollection="toyval",
                  rootpath=world, val_set="no", config_name="tiny",
                  num_epochs=2, batch_size=8, model_prefix="mesh_sweep")
    mesh = data_parallel_mesh(4)
    sharded = sweep_main(opt, seeds, mesh=mesh)

    for h, m in zip(host, sharded):
        assert len(h["history"]) == len(m["history"])
        for he, me in zip(h["history"], m["history"]):
            np.testing.assert_allclose(me["loss"], he["loss"], rtol=1e-3)
            for k in ("r1", "r5", "r10", "medr", "mir"):
                assert he[k] == me[k], (h["model_path"], he["epoch"], k)
        np.testing.assert_allclose(m["best_perf"], h["best_perf"], rtol=1e-5)


def test_sweep_mesh_requires_divisible_seeds(world):
    from laff_tpu.engine import Options
    from laff_tpu.engine.sweep import sweep_main
    from laff_tpu.parallel import data_parallel_mesh

    opt = Options(trainCollection="toytrain", valCollection="toyval",
                  rootpath=world, val_set="no", config_name="tiny",
                  num_epochs=1, batch_size=8, model_prefix="bad_sweep")
    with pytest.raises(ValueError, match="divide"):
        sweep_main(opt, [1, 2, 3], mesh=data_parallel_mesh(2))


def test_sweep_2d_seed_dp_mesh(world):
    """A ('seed', 'dp') mesh shards seeds over rows and each seed's batch
    over its dp group; trajectories must match the unsharded sweep (GSPMD
    inserts the within-seed collectives; nothing crosses seed rows)."""
    from laff_tpu.engine import Options
    from laff_tpu.engine.sweep import sweep_main
    from laff_tpu.parallel import seed_data_mesh

    seeds = [21, 22]
    opt = Options(trainCollection="toytrain", valCollection="toyval",
                  rootpath=world, val_set="no", config_name="tiny",
                  num_epochs=2, batch_size=8, model_prefix="host2d")
    host = sweep_main(opt, seeds)

    opt = Options(trainCollection="toytrain", valCollection="toyval",
                  rootpath=world, val_set="no", config_name="tiny",
                  num_epochs=2, batch_size=8, model_prefix="mesh2d")
    sharded = sweep_main(opt, seeds, mesh=seed_data_mesh(2, 2))

    for h, m in zip(host, sharded):
        for he, me in zip(h["history"], m["history"]):
            np.testing.assert_allclose(me["loss"], he["loss"], rtol=1e-3)
            for k in ("r1", "r5", "r10", "medr", "mir"):
                assert he[k] == me[k], (h["model_path"], he["epoch"], k)
        np.testing.assert_allclose(m["best_perf"], h["best_perf"],
                                   rtol=1e-5)

    # batch not divisible by dp -> loud error
    opt = Options(trainCollection="toytrain", valCollection="toyval",
                  rootpath=world, val_set="no", config_name="tiny",
                  num_epochs=1, batch_size=9, model_prefix="bad2d")
    with pytest.raises(ValueError, match="batch_size"):
        sweep_main(opt, seeds, mesh=seed_data_mesh(2, 2))
