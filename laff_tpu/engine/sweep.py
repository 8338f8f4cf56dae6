"""Batched multi-seed training: S independent runs fused into one jitted
program via ``jax.vmap`` over the TrainState axis.

The reference sweeps random seeds as *separate GPU jobs* (a PID queue
round-robining ``--device`` across a card list, reference
``shell/retrieval_task.sh:17-45,118-155``). On TPU the LAFF towers are far
too small to saturate the MXU one run at a time (train-step profiling
shows the chip >90% idle at flagship dims — the step is
latency/optimizer-traffic bound, ROADMAP "train-step MFU"). Instead of
queueing S processes onto one chip (HBM contention, S× dispatch
overhead), we stack the S per-seed TrainStates on a leading axis and vmap
the *same* pure transition the single-run trainer uses: every matmul in
the step becomes S-way batched, the optimizer traffic is issued once per
dispatch instead of once per seed, and the whole sweep trains in a single
process at near-single-run wall clock.

Semantics: each seed slice evolves exactly as its independent run would —
  * per-seed init (``init_state(seed=s)``),
  * per-seed shuffle order (``PairFeed(seed=s)``; batches stack (S, B, …)),
  * the per-step dropout rng is epoch-derived and seed-independent in the
    single-run trainer (``train_one_epoch``: ``rng = jax.random.key(epoch)``),
    so sharing it across the vmap axis *is* the single-run behavior,
  * per-seed LR controllers (plateau decisions diverge; the learning rate
    lives in ``opt_state.hyperparams`` as an (S,) leaf),
  * per-seed early stopping: a stopped seed's slice is frozen by a
    ``jnp.where(active, …)`` mask so later epochs cannot perturb it while
    the surviving seeds keep training,
  * per-seed checkpoints in per-seed model dirs — byte-compatible with
    the single-run layout, so the predictor consumes them unchanged.

Numerics: vmapped matmuls may tile reductions differently from their
unbatched forms, so sweep training tracks the independent runs to float
rounding (tested ~1e-5 relative on CPU), not bit-for-bit.
"""

from __future__ import annotations

import os
import time
from copy import copy
from dataclasses import asdict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import EvalFeed, Prefetcher, host_cast_bf16
from ..models import LAFFModel
from ..utils import AverageMeter, get_logger
from .checkpoint import average_states, save_checkpoint, save_checkpoint_dance
from .evaluator import validate
from .prepare import Prepared, model_dir_for
from .trainer import (
    LRController,
    ScalarLogger,
    TrainState,
    _AsyncSaver,
    _jit_step,
    anneal_schedule,
    init_state,
    make_cached_train_step,
    make_optimizer,
    make_train_step,
    make_txt_cached_train_step,
    make_w2v_pooled_train_step,
)

logger = get_logger(__name__)


# ---------------------------------------------------------------------------
# state stacking


def _sweep_axes(mesh):
    """(seed_axis, batch_axis) names for a sweep mesh. 1-D meshes put the
    seed axis on 'dp'; a 2-D ('seed', 'dp') mesh (parallel.seed_data_mesh)
    additionally shards each seed's batch over 'dp'."""
    if mesh is None:
        return None, None
    if "seed" in mesh.shape:
        return "seed", ("dp" if "dp" in mesh.shape else None)
    return "dp", None


def _put_sweep(tree, mesh, seed_index: int):
    """Device-put a host pytree with the seed axis (at ``seed_index``)
    sharded over the mesh's seed axis and, on a 2-D mesh, the following
    (per-seed batch) axis sharded over 'dp'."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    seed_ax, batch_ax = _sweep_axes(mesh)

    def put(x):
        x = np.asarray(x) if not isinstance(x, jnp.ndarray) else x
        spec = [None] * x.ndim
        spec[seed_index] = seed_ax
        if batch_ax is not None and x.ndim > seed_index + 1:
            spec[seed_index + 1] = batch_ax
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)


def stack_states(states: List[TrainState], mesh=None) -> TrainState:
    """Stack S per-seed TrainStates on a new leading axis.

    Without a mesh this is a device-side stack — note it transiently holds
    both the per-seed buffers and the stacked copy (2× state HBM; at
    flagship dims ~1 GB/seed with adam moments, so cap S accordingly).
    With a mesh the stack assembles on the HOST and lands directly
    sharded over the seed axis: each device receives only its own seed
    slices and no single device ever holds the full stack (on a 2-D
    ('seed', 'dp') mesh, a seed's state replicates across its dp group)."""
    if mesh is None:
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
    host = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *states)
    return _put_sweep_state(host, mesh)


def _put_sweep_state(host_state, mesh):
    """States shard the seed axis only — params/opt leaves replicate
    across each seed's 'dp' group."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    seed_ax, _ = _sweep_axes(mesh)

    def put(x):
        spec = [None] * np.ndim(x)
        if spec:
            spec[0] = seed_ax
        return jax.device_put(np.asarray(x), NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, host_state)


def slice_state(stacked: TrainState, i: int) -> TrainState:
    """Host-materialized seed slice ``i`` (for checkpoints / validation)."""
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


def set_learning_rates(state: TrainState, lrs, mesh=None) -> TrainState:
    """Per-seed learning rates into the stacked optimizer hyperparams
    ((S,) leaf; sharded over the seed axis like the rest of the state)."""
    arr = np.asarray(lrs, dtype=np.float32)
    if mesh is not None:
        arr = _put_sweep_state(arr, mesh)
    else:
        arr = jnp.asarray(arr)
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = arr
    return state.replace(opt_state=opt_state)


# ---------------------------------------------------------------------------
# the vmapped step


def make_sweep_step(train_step, with_task3: bool = False):
    """vmap a (possibly cache/pooling-wrapped) train step over the seed
    axis. States and batches carry a leading (S, …) axis; the rng and the
    ``extras`` pytree (HBM feature caches, w2v table — identical data for
    every seed) are shared across the axis. An (S,) bool ``active`` mask
    freezes early-stopped seeds: their slices pass through unchanged.
    """
    transition = train_step._transition
    extras = train_step._extras

    def sweep_transition(states, txt_s, vis_s, rng, active,
                         false_s=None, mask_s=None, epoch=0, extras=None):
        if with_task3:
            def one(s, t, v, f, m):
                return transition(s, t, v, rng, f, m, epoch, extras)

            new_states, losses = jax.vmap(one)(states, txt_s, vis_s,
                                               false_s, mask_s)
        else:
            def one(s, t, v):
                return transition(s, t, v, rng, extras=extras)

            new_states, losses = jax.vmap(one)(states, txt_s, vis_s)
        keep = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
            ),
            new_states, states,
        )
        return keep, losses

    jitted = _jit_step(sweep_transition)

    def sweep_step(states, txt_s, vis_s, rng, active,
                   false_s=None, mask_s=None, epoch=0):
        return jitted(states, txt_s, vis_s, rng, active, false_s, mask_s,
                      epoch, extras)

    sweep_step._transition = sweep_transition
    sweep_step._extras = extras
    return sweep_step


def make_multi_sweep_step(sweep_step, with_task3: bool = False):
    """K sweep steps in one dispatch (lax.scan over the leading K axis of
    (K, S, B, …) stacks; the (S,) active mask is fixed within a dispatch)."""
    transition = sweep_step._transition
    extras = sweep_step._extras

    def multi_transition(states, txt_stack, vis_stack, rngs, active,
                         false_stack=None, mask_stack=None, epoch=0,
                         extras=None):
        if with_task3:
            xs = (txt_stack, vis_stack, rngs, false_stack, mask_stack)

            def body(s, x):
                t, v, r, f, m = x
                return transition(s, t, v, r, active, f, m, epoch, extras)
        else:
            xs = (txt_stack, vis_stack, rngs)

            def body(s, x):
                t, v, r = x
                return transition(s, t, v, r, active, extras=extras)
        return jax.lax.scan(body, states, xs)

    jitted = _jit_step(multi_transition)

    def multi_step(states, txt_stack, vis_stack, rngs, active,
                   false_stack=None, mask_stack=None, epoch=0):
        return jitted(states, txt_stack, vis_stack, rngs, active,
                      false_stack, mask_stack, epoch, extras)

    return multi_step


# ---------------------------------------------------------------------------
# batched validation


class SweepEmbedder:
    """Tower application for all S seeds in one dispatch per eval batch.

    Featurizes each validation batch ONCE on the host and vmaps the tower
    over the stacked variables — S× less host featurization and S× fewer
    dispatches than looping per-seed Embedders.
    """

    def __init__(self, model, spec, prefetch_depth: int = 2):
        self.model = model
        self.vars = None  # set per epoch (setter avoids per-epoch re-jits)
        self._txt_bf16 = spec.txt.compute_dtype == "bfloat16"
        self._vis_bf16 = spec.vis.compute_dtype == "bfloat16"

        def txt_fn(variables, batch):
            return model.apply(variables, batch, method=model.encode_txt)

        def vis_fn(variables, batch):
            return model.apply(variables, batch, method=model.encode_vis)

        self._txt = jax.jit(jax.vmap(txt_fn, in_axes=(0, None)))
        self._vis = jax.jit(jax.vmap(vis_fn, in_axes=(0, None)))
        self.prefetch_depth = prefetch_depth

    def _embed(self, fn, feed: EvalFeed, bf16: bool):
        from .evaluator import _device_batches

        chunks, ids = [], []
        for dev, batch_ids, valid in _device_batches(
                feed, bf16, self.prefetch_depth, mesh=None):
            emb = fn(self.vars, dev)  # (S, B, ...)
            chunks.append(emb[:, :valid] if valid < emb.shape[1] else emb)
            ids.extend(batch_ids)
        return jnp.concatenate(chunks, axis=1), ids

    def embed_txt(self, feed):
        return self._embed(self._txt, feed, self._txt_bf16)

    def embed_vis(self, feed):
        return self._embed(self._vis, feed, self._vis_bf16)


class _SeedView:
    """Single-seed view over SweepEmbedder output, shaped like Embedder
    for ``evaluator.validate`` (embeds once, serves every seed)."""

    def __init__(self, txt_embs, txt_ids, vis_embs, vis_ids):
        self._t, self._ti = txt_embs, txt_ids
        self._v, self._vi = vis_embs, vis_ids

    def embed_txt(self, feed):
        return self._t, self._ti

    def embed_vis(self, feed):
        return self._v, self._vi


# ---------------------------------------------------------------------------
# the sweep driver


def sweep_main(opt, seeds: List[int], prepared: Optional[Prepared] = None,
               mesh=None) -> List[Dict]:
    """Train ``len(seeds)`` independent runs of ``opt``'s experiment in one
    fused program. Returns one ``trainer.main``-shaped result dict per
    seed; writes per-seed checkpoints/logs under per-seed model dirs
    (``<prefix>_seed_<s>`` unless ``opt.model_prefix`` already encodes the
    seed), so downstream prediction is unchanged.

    With a 1-D ``mesh`` the SEED axis shards over the mesh's 'dp'
    devices: each device trains its own seed slices with ZERO collectives
    (seeds are independent), so an N-chip slice runs an N× wider sweep at
    the same wall clock — the pod-scale form of the reference's
    one-job-per-GPU queue. With a 2-D ('seed', 'dp') mesh
    (``parallel.seed_data_mesh``) each seed's batch additionally shards
    over its 'dp' group (GSPMD inserts the gradient/BN collectives within
    the group; nothing crosses seed rows). ``len(seeds)`` must divide the
    seed axis and ``batch_size`` the 'dp' axis; feature caches replicate.

    Restrictions vs ``trainer.main`` (all loud): no
    ``trainCollection2`` second feed, no mid-run resume.
    """
    from .prepare import prepare

    if mesh is not None:
        seed_ax, batch_ax = _sweep_axes(mesh)
        n_seed_devs = mesh.shape.get(seed_ax, 1)
        if len(seeds) % n_seed_devs:
            raise ValueError(
                f"{len(seeds)} seeds must divide the mesh "
                f"{seed_ax!r} axis ({n_seed_devs})")
        if batch_ax is not None and opt.batch_size % mesh.shape[batch_ax]:
            raise ValueError(
                f"batch_size {opt.batch_size} must divide the mesh "
                f"'dp' axis ({mesh.shape[batch_ax]})")
    if getattr(opt, "trainCollection2", "None") != "None":
        raise NotImplementedError(
            "batched seed sweeps do not support trainCollection2 "
            "(run seeds as separate jobs for two-feed recipes)")
    if getattr(opt, "resume", 0):
        raise NotImplementedError("batched seed sweeps do not support "
                                  "--resume; rerun the sweep from scratch")
    S = len(seeds)
    if S < 1:
        raise ValueError("need at least one seed")

    base_prefix = getattr(opt, "model_prefix", "runs_0")
    per_seed_opts = []
    for s in seeds:
        o = copy(opt)
        o.random_seed = s
        o.model_prefix = f"{base_prefix}_seed_{s}" if S > 1 else base_prefix
        per_seed_opts.append(o)

    if prepared is None:
        prepared = prepare(per_seed_opts[0])
    config = prepared.config
    spec = prepared.spec

    model = LAFFModel(spec)
    tx = make_optimizer(config, spec)

    # per-seed feeds: same batchers/data, per-seed shuffle order; task3
    # negationset line order is also seed-dependent in prepare
    # (TextSource(shuffle_seed=random_seed)), so rebuild it per seed
    feeds = []
    for s in seeds:
        f = copy(prepared.train_feed)
        f.seed = s
        if f.task3_source is not None and s != seeds[0]:
            from ..data.sources import TextSource

            capfile_task3 = os.path.join(
                opt.rootpath, opt.trainCollection, "TextData",
                f"{opt.trainCollection}.caption.{opt.task3_caption}.txt",
            )
            f.task3_source = TextSource(
                capfile_task3, task3=True, shuffle_seed=s)
            f._augmented = f.task3_source.negation_augmented()
        feeds.append(f)

    # the GRU word-embedding init is the one np.random product of
    # prepare() (np.random.seed(random_seed) -> get_we uniform init,
    # reference model/model.py:30-48): regenerate it per seed so each
    # slice initializes exactly like its independent run
    states = []
    shared_we = prepared.we
    for s in seeds:
        if shared_we is not None:
            from .prepare import get_we, w2v_dir_for

            np.random.seed(s)
            prepared.we = get_we(
                prepared.gru_vocab, w2v_dir_for(opt.rootpath, config))
        states.append(init_state(model, spec, prepared, tx, seed=s))
    prepared.we = shared_we
    if opt.pretrained_file_path != "None":
        # warm start every seed from the same weights (reference
        # load_pretrained_model semantics; seeds then differ only in
        # shuffle order, exactly like S warm-started independent jobs)
        from .checkpoint import load_checkpoint

        ckpt = load_checkpoint(opt.pretrained_file_path)
        states = [
            s.replace(
                params=ckpt["params"],
                batch_stats=ckpt.get("batch_stats") or s.batch_stats,
                schedule=ckpt.get("schedule") or s.schedule,
            )
            for s in states
        ]
        logger.info("sweep warm-started %d seeds from %s", S,
                    opt.pretrained_file_path)
    # under a mesh the SEED axis is the data-parallel axis: every leaf
    # shards its leading dim over 'dp' (GSPMD then runs each device's
    # seed slices with no collectives at all)
    stacked = stack_states(states, mesh=mesh)
    del states

    raw_step = make_train_step(model, tx, spec)
    train_step = raw_step
    cast_txt = spec.txt.compute_dtype == "bfloat16"
    cast_vis = spec.vis.compute_dtype == "bfloat16"
    if prepared.w2v_table is not None:
        table = prepared.w2v_table
        if mesh is not None:
            from ..parallel import replicate

            table = replicate(table, mesh)
        train_step = make_w2v_pooled_train_step(train_step, table)

    # device caches: identical policy to trainer.main, shared across seeds
    budget = int(os.environ.get("LAFF_TPU_CACHE_BUDGET", 4 * 1024**3))
    txt_deterministic = spec.task3 is None
    from .feature_cache import (
        DeviceTxtCache, DeviceVisCache, estimate_txt_cache_bytes,
        estimate_vis_cache_bytes,
    )

    vis_cache = None
    want_vis = int(getattr(opt, "device_feature_cache", -1))
    if want_vis == -1:
        want_vis = int(estimate_vis_cache_bytes(
            prepared.train_feed.vis_batcher, bf16=cast_vis) <= budget)
    if want_vis:
        vis_cache = DeviceVisCache(prepared.train_feed.vis_batcher,
                                   bf16=cast_vis, mesh=mesh)
        train_step = make_cached_train_step(train_step, vis_cache.arrays)
    txt_cache = None
    want_txt = int(getattr(opt, "device_text_cache", -1))
    if want_txt == -1:
        want_txt = int(
            want_vis and txt_deterministic
            and estimate_txt_cache_bytes(
                prepared.train_feed.text_batcher,
                cap_ids=prepared.train_feed.cap_ids, bf16=cast_txt,
            ) + (vis_cache.nbytes if vis_cache else 0) <= budget
        )
    if want_txt:
        txt_cache = DeviceTxtCache(
            prepared.train_feed.text_batcher,
            cap_ids=prepared.train_feed.cap_ids, bf16=cast_txt, mesh=mesh,
        )
        train_step = make_txt_cached_train_step(train_step, txt_cache.arrays)
    for f in feeds:
        f.featurize_txt = txt_cache is None
        f.featurize_vis = vis_cache is None

    with_task3 = spec.task3 is not None
    sweep_step = make_sweep_step(train_step, with_task3=with_task3)
    spd = int(getattr(opt, "steps_per_dispatch", -1))
    if spd <= 0:
        spd = min(8, max(1, prepared.train_feed.steps_per_epoch())) \
            if txt_cache is not None and vis_cache is not None else 1
    multi_step = (make_multi_sweep_step(sweep_step, with_task3=with_task3)
                  if spd > 1 else None)

    lr_ctls = [LRController(config.lr, config.lr_decay_rate) for _ in seeds]
    model_paths = [model_dir_for(o) for o in per_seed_opts]
    scalar_logs = []
    hists = []
    for p in model_paths:
        os.makedirs(p, exist_ok=True)
        scalar_logs.append(ScalarLogger(p))
        hists.append(open(os.path.join(p, "val_perf_hist.txt"), "w"))

    val_txt_feed = EvalFeed(
        prepared.val_txt_source.cap_ids, prepared.val_txt_batcher,
        batch_size=getattr(config, "eval_batch_size", 1024),
    )
    val_vis_feed = EvalFeed(
        prepared.val_vis_ids, prepared.val_vis_batcher,
        batch_size=getattr(config, "eval_batch_size", 1024),
    )
    if getattr(opt, "stage_val_features", 1):
        # epoch-invariant val features: upload once, replay from HBM
        val_txt_feed.stage_on_device = True
        val_vis_feed.stage_on_device = True

    best_perf = [0.0] * S
    no_impr = [0] * S
    mean_last: List[list] = [[] for _ in seeds]
    active = np.ones((S,), dtype=bool)
    results: List[Dict] = [
        {"best_perf": 0.0, "epochs": 0, "model_path": p, "history": []}
        for p in model_paths
    ]
    saver = _AsyncSaver()

    def _host(tree):
        return jax.tree_util.tree_map(np.asarray, tree)

    embedder = SweepEmbedder(model, spec)

    def ckpt_payload(i, epoch, seed_state):
        return {
            "epoch": epoch + 1,
            "params": seed_state["params"],
            "batch_stats": seed_state["batch_stats"],
            "schedule": seed_state["schedule"],
            "best_perf": best_perf[i],
            "config": config,
            "opt": (asdict(per_seed_opts[i])
                    if hasattr(per_seed_opts[i], "__dataclass_fields__")
                    else vars(per_seed_opts[i])),
            "spec": spec,
        }

    for epoch in range(opt.num_epochs):
        if not active.any():
            break
        lrs = [c.current() for c in lr_ctls]
        stacked = set_learning_rates(stacked, lrs, mesh=mesh)
        stacked = anneal_schedule(
            stacked, config.txt_attention_global_decay_rate)
        for i in range(S):
            if active[i]:
                scalar_logs[i].add_scalar("train/learning_rate", lrs[i], epoch)
        logger.info("sweep epoch %d/%d seeds=%s lrs=%s active=%s",
                    epoch, opt.num_epochs, seeds,
                    ["%.3g" % v for v in lrs], active.tolist())

        t0 = time.time()
        stacked, losses = _sweep_epoch(
            sweep_step, multi_step, stacked, feeds, epoch,
            jnp.asarray(active), spd, cast_txt, cast_vis,
            vis_cache, txt_cache, with_task3, mesh=mesh,
        )
        epoch_time = time.time() - t0

        # one featurization+embedding pass serves every seed
        eval_vars = {"params": stacked.params}
        if stacked.batch_stats:
            eval_vars["batch_stats"] = stacked.batch_stats
        if stacked.schedule:
            eval_vars["schedule"] = stacked.schedule
        embedder.vars = eval_vars
        txt_embs, txt_ids = embedder.embed_txt(val_txt_feed)
        vis_embs, vis_ids = embedder.embed_vis(val_vis_feed)

        # checkpoints need params/BN/schedule only — not the adam moments
        # (2/3 of the state bytes; the fetch rides the host link)
        host_state = _host({"params": stacked.params,
                            "batch_stats": stacked.batch_stats,
                            "schedule": stacked.schedule})
        for i in range(S):
            if not active[i]:
                continue
            view = _SeedView(txt_embs[i], txt_ids, vis_embs[i], vis_ids)
            metrics = validate(view, val_txt_feed, val_vis_feed,
                               measure=spec.measure)
            cur = metrics[opt.metric]
            for tag in ("r1", "r5", "r10", "medr", "meanr", "mir", "mAP"):
                scalar_logs[i].add_scalar(f"val/{tag}", metrics[tag], epoch)
            logger.info(
                "seed %d epoch %d: loss=%.3f r1=%.2f r5=%.2f r10=%.2f "
                "medr=%.0f mir=%.4f (%.1fs)",
                seeds[i], epoch, losses[i], metrics["r1"], metrics["r5"],
                metrics["r10"], metrics["medr"], metrics["mir"], epoch_time)
            hists[i].write("epoch_%d:\nText2Video(%s): %f\n"
                           % (epoch, opt.metric, cur))
            hists[i].flush()
            results[i]["history"].append(
                {"epoch": epoch, "loss": float(losses[i]),
                 "lr": float(lrs[i]),
                 **{k: float(metrics[k]) for k in
                    ("r1", "r5", "r10", "medr", "meanr", "mir", "mAP")}})

            lr_ctls[i].step(cur)
            seed_state = jax.tree_util.tree_map(lambda x: x[i], host_state)
            is_best = cur > best_perf[i]
            best_perf[i] = max(cur, best_perf[i])
            saver.submit(
                save_checkpoint_dance, ckpt_payload(i, epoch, seed_state),
                is_best, logdir=model_paths[i],
                filename=f"checkpoint_epoch_{epoch}.pth.tar")
            if is_best:
                no_impr[i] = 0
                mean_last[i] = []
            elif getattr(opt, "save_mean_last", 0) == 1:
                mean_last[i].append(seed_state["params"])
                if len(mean_last[i]) > 1:
                    payload = ckpt_payload(i, epoch, seed_state)
                    payload["params"] = average_states(mean_last[i])
                    save_checkpoint(payload, os.path.join(
                        model_paths[i], "mean_last10.pth.tar"))
            no_impr[i] += 1
            if no_impr[i] > 10 or epoch == opt.num_epochs - 1:
                saver.join()
                save_checkpoint_dance(
                    ckpt_payload(i, epoch, seed_state), is_best=False,
                    logdir=model_paths[i],
                    filename=f"checkpoint_epoch_{epoch}.pth.tar",
                    only_best=True)
                active[i] = False
                results[i]["epochs"] = epoch + 1
                logger.info("seed %d stopped at epoch %d (best %.4f)",
                            seeds[i], epoch, best_perf[i])

    saver.join()
    for i in range(S):
        results[i]["best_perf"] = best_perf[i]
        if results[i]["epochs"] == 0:
            results[i]["epochs"] = opt.num_epochs
        msg = ("best performance on validation:\n Text to video(%s): %f"
               % (opt.metric, best_perf[i]))
        with open(os.path.join(model_paths[i], "val_perf.txt"), "w") as fh:
            fh.write(msg)
        hists[i].close()
        scalar_logs[i].close()
    return results


def _sweep_epoch(sweep_step, multi_step, stacked, feeds, epoch, active,
                 steps_per_dispatch, cast_txt, cast_vis, vis_cache,
                 txt_cache, with_task3, mesh=None):
    """One epoch over S aligned per-seed feeds. All feeds iterate the same
    caption set with drop_last batching, so they yield the same number of
    identically-shaped batches; step t stacks the S seeds' t-th batches on
    a leading axis. Returns (state, per-seed mean loss (S,)).

    With a mesh, the leading seed axis of every stack shards over 'dp'
    (axis 1 for (K, S, …) scan stacks)."""
    rng = jax.random.key(epoch)
    use_scan = multi_step is not None and steps_per_dispatch > 1
    meters = [AverageMeter() for _ in feeds]
    pending = []
    buf = []

    def put(tree, seed_axis):
        if mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, tree)
        return _put_sweep(tree, mesh, seed_axis)

    def stack_seed_batches(batches, key, bf16):
        lead = batches[0][key]
        out = {}
        for k in lead:
            arrs = [b[key][k] for b in batches]
            if bf16:
                arrs = [host_cast_bf16({k: a})[k] for a in arrs]
            out[k] = np.stack(arrs)
        return out

    def seed_stacked_args(batches):
        """(S, B, ...) host txt/vis args for one step across seeds."""
        if txt_cache is not None:
            txt = np.stack(
                [txt_cache.indices(b["cap_ids"]) for b in batches])
        else:
            txt = stack_seed_batches(batches, "txt", cast_txt)
        if vis_cache is not None:
            vis = np.stack(
                [vis_cache.indices(b["vis_ids"]) for b in batches])
        else:
            vis = stack_seed_batches(batches, "vis", cast_vis)
        extra = {}
        if with_task3:
            extra["false"] = stack_seed_batches(batches, "false_txt", cast_txt)
            extra["mask"] = np.stack([b["task3_mask"] for b in batches])
        return txt, vis, extra

    def flush(stacked):
        if not buf:
            return stacked
        if use_scan and len(buf) == steps_per_dispatch:
            txts, viss, extras_l, rngs = [], [], [], []
            for step_batches, r in buf:
                t, v, e = seed_stacked_args(step_batches)
                txts.append(t)
                viss.append(v)
                extras_l.append(e)
                rngs.append(r)
            stack_k = lambda trees: jax.tree_util.tree_map(  # noqa: E731
                lambda *xs: np.stack(xs), *trees)
            txt_ks = put(stack_k(txts), 1)
            vis_ks = put(stack_k(viss), 1)
            rng_ks = jnp.stack(rngs)
            if with_task3:
                false_ks = put(stack_k([e["false"] for e in extras_l]), 1)
                mask_ks = put(np.stack([e["mask"] for e in extras_l]), 1)
                new, losses = multi_step(stacked, txt_ks, vis_ks, rng_ks,
                                         active, false_ks, mask_ks, epoch)
            else:
                new, losses = multi_step(stacked, txt_ks, vis_ks, rng_ks,
                                         active)
            pending.append(losses)  # (K, S)
        else:
            new = stacked
            for step_batches, r in buf:
                t, v, e = seed_stacked_args(step_batches)
                if with_task3:
                    new, losses = sweep_step(new, put(t, 0), put(v, 0), r,
                                             active, put(e["false"], 0),
                                             put(e["mask"], 0), epoch)
                else:
                    new, losses = sweep_step(new, put(t, 0), put(v, 0), r,
                                             active)
                pending.append(losses[None])  # (1, S)
        buf.clear()
        return new

    iters = [Prefetcher(f.epoch(epoch), depth=2) for f in feeds]
    for step_batches in zip(*iters):
        rng, step_rng = jax.random.split(rng)
        buf.append((list(step_batches), step_rng))
        if len(buf) >= (steps_per_dispatch if use_scan else 1):
            stacked = flush(stacked)
    stacked = flush(stacked)
    if pending:
        vals = np.asarray(jnp.concatenate(pending, axis=0))  # (steps, S)
        for i, m in enumerate(meters):
            for v in vals[:, i]:
                m.update(float(v))
    return stacked, np.asarray([m.avg for m in meters])
