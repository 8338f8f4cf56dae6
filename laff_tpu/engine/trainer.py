"""Training driver: optax optimizer, jitted train step, epoch loop.

Functional parity with reference ``trainer.py:315-645`` (epoch loop,
annealed attention residual, LR schedules, best/mean-last checkpointing,
early stop) re-designed for TPU:

* One jitted train step = full forward + loss + backward + update; the
  whole thing compiles once (static batch shape) and runs from HBM.
* The model owns nothing: params/batch_stats/schedule/opt_state live in a
  TrainState pytree; the optimizer is an optax chain (global-norm clip +
  adam(eps=1e-4) / rmsprop, matching reference model-owned optimizers at
  ``model/model.py:2010-2028``).
* LR control (StepLR gamma^epoch x ReduceLROnPlateau 0.5/patience-2) is a
  host-side controller that writes the scalar into the injected
  hyperparams — no recompilation.
* Data-parallel scaling: pass a ``jax.sharding.Mesh``; batches are sharded
  over the 'dp' axis and GSPMD inserts the gradient/batch-stat collectives
  (the reference has no distributed runtime at all — SURVEY.md section 2.2).
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict
from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import EvalFeed, Prefetcher, host_cast_bf16
from ..models import LAFFModel
from ..ops import (
    cross_entropy_loss,
    dual_softmax_loss,
    triplet_loss,
    triplet_loss_multi_space,
)
from ..parallel import shard_batch
from ..utils import AverageMeter, Progress, get_logger
from .checkpoint import average_states, save_checkpoint, save_checkpoint_dance
from .evaluator import Embedder, validate
from .prepare import Prepared

logger = get_logger(__name__)


class _AsyncSaver:
    """One-slot background checkpoint writer: the epoch loop hands the
    payload off and keeps training while device->host transfer + pickle +
    disk write happen in a worker thread. submit() joins the previous
    write first, so saves are strictly ordered and at most one is in
    flight; join() at loop end guarantees files exist before main
    returns."""

    def __init__(self):
        self._thread = None

    def submit(self, fn, *args, **kwargs):
        self.join()
        import threading

        self._thread = threading.Thread(
            target=fn, args=args, kwargs=kwargs, daemon=True
        )
        self._thread.start()

    def join(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    schedule: Any
    opt_state: Any
    step: jnp.ndarray


def _backbone_mask(params):
    """True for params of in-graph backbones (the live BERT tower), which
    the reference trains at lr/20 (model/model.py:2013-2020)."""
    def mark(path, _):
        keys = {getattr(p, "key", "") for p in path}
        return "bert" in keys and "txt_net" in keys

    return jax.tree_util.tree_map_with_path(mark, params)


def make_optimizer(config, spec=None):
    scale_backbone = spec is not None and getattr(spec.txt, "bert", None) is not None

    def build(learning_rate):
        chain = []
        if config.grad_clip and config.grad_clip > 0:
            chain.append(optax.clip_by_global_norm(config.grad_clip))
        if config.optimizer == "adam":
            chain.append(optax.adam(learning_rate, eps=1e-4))
        elif config.optimizer == "rmsprop":
            chain.append(optax.rmsprop(learning_rate))
        else:
            raise ValueError(f"optimizer {config.optimizer}")
        if scale_backbone:
            # post-optimizer update scaling == per-group lr/20 (Adam's
            # updates are lr-linear), tracking the global LR controller
            chain.append(optax.masked(optax.scale(1.0 / 20.0), _backbone_mask))
        return optax.chain(*chain)

    return optax.inject_hyperparams(build)(learning_rate=config.lr)


class LRController:
    """StepLR(gamma, per-epoch) x ReduceLROnPlateau(max, 0.5, patience=2)
    (reference ``model/model.py:2026-2028`` + ``lr_step``)."""

    def __init__(self, base_lr: float, gamma: float, plateau_factor: float = 0.5,
                 patience: int = 2):
        self.base_lr = base_lr
        self.gamma = gamma
        self.plateau_factor = plateau_factor
        self.patience = patience
        self.plateau_scale = 1.0
        self.best = -float("inf")
        self.bad_epochs = 0
        self.epoch = 0

    def current(self) -> float:
        return self.base_lr * (self.gamma ** self.epoch) * self.plateau_scale

    def step(self, val_metric: float) -> float:
        self.epoch += 1
        if val_metric > self.best:
            self.best = val_metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.plateau_scale *= self.plateau_factor
                self.bad_epochs = 0
        return self.current()


def make_loss_fn(spec):
    kwargs = dict(
        margin=spec.margin,
        measure=spec.measure,
        direction=spec.direction,
        max_violation=spec.max_violation,
        cost_style=spec.cost_style,
    )

    def _head_mean_scores(txt_embs, vis_embs):
        # head-meaned (im, s) score matrix honoring spec.measure, like the
        # reference get_txt2vis_matrix (model/model.py:1003-1016): mean of
        # per-head compute_sim over the configured measure
        if spec.measure == "hist":
            from ..ops import hist_sim

            sims = jax.vmap(hist_sim, in_axes=(1, 1))(vis_embs, txt_embs)
            return jnp.mean(sims, axis=0)
        from ..ops import multi_head_cosine_sim

        return multi_head_cosine_sim(vis_embs, txt_embs)

    def loss_fn(txt_embs, vis_embs):
        if spec.loss in ("dsl", "CELoss"):
            fn = dual_softmax_loss if spec.loss == "dsl" else cross_entropy_loss
            if txt_embs.ndim == 3 and spec.multi_space:
                # reference compute_loss applies the criterion per head and
                # sums whenever multi_space (model/model.py:2036-2038) —
                # for ANY configured criterion, not just the triplet
                per_head = jax.vmap(fn, in_axes=(1, 1))(txt_embs, vis_embs)
                return jnp.sum(per_head)
            if txt_embs.ndim == 3:
                # single space: criterion on the head-meaned score matrix
                from ..ops.losses import (
                    cross_entropy_loss_from_scores,
                    dual_softmax_loss_from_scores,
                )

                scores = _head_mean_scores(txt_embs, vis_embs)
                if spec.loss == "dsl":
                    return dual_softmax_loss_from_scores(scores)
                return cross_entropy_loss_from_scores(scores)
            return fn(txt_embs, vis_embs)
        if txt_embs.ndim == 3 and spec.multi_space:
            return triplet_loss_multi_space(txt_embs, vis_embs, **kwargs)
        if txt_embs.ndim == 3:
            # single-space over multi-head embs: mean sim over heads, with
            # the measure honored (a hist-trained config must not silently
            # optimize cosine while validation ranks with Jaccard)
            from ..ops import triplet_loss_from_scores

            scores = _head_mean_scores(txt_embs, vis_embs)
            return triplet_loss_from_scores(
                scores, spec.margin, spec.direction, spec.max_violation,
                spec.cost_style,
            )
        return triplet_loss(txt_embs, vis_embs, **kwargs)

    return loss_fn


def _masked_margin2(
    txt_embs, vis_embs, false_embs, mask, task3, epoch
):
    """Per-row dual-margin negation loss, masked over rows with no entry
    and scaled like the reference (sum / n_valid * batch, reference
    ``model/model.py:942-949``); vmapped over heads for multi-space."""
    from ..ops.norms import l2norm

    valid = (mask > -1).astype(jnp.float32)
    weight = jnp.where(mask > -1, mask.astype(jnp.float32), 0.0)
    weight = weight * (task3.neg_weight - 1.0) + 1.0

    def row_cost(t, v, f):
        t, v, f = l2norm(t), l2norm(v), l2norm(f)
        s_t = jnp.sum(t * v, axis=-1)
        s_f = jnp.sum(f * v, axis=-1)
        s_f2 = jnp.sum(f * t, axis=-1)
        cost = jnp.zeros_like(s_t)
        if task3.bottom_margin is not None:
            cost += jnp.clip(task3.bottom_margin + s_f - s_t, min=0.0)
        if task3.upper_margin is not None:
            cost += jnp.clip(-task3.upper_margin - s_f + s_t, min=0.0)
        if task3.bottom_margin_t2t is not None:
            cost += jnp.clip(task3.bottom_margin_t2t + s_f2 - s_t, min=0.0)
        if task3.upper_margin_t2t is not None:
            cost += jnp.clip(-task3.upper_margin_t2t - s_f2 + s_t, min=0.0)
        return cost

    if txt_embs.ndim == 3:
        costs = jax.vmap(row_cost, in_axes=(1, 1, 1))(
            txt_embs, vis_embs, false_embs
        )  # (H, B)
        cost = jnp.sum(costs, axis=0)
    else:
        cost = row_cost(txt_embs, vis_embs, false_embs)

    n_valid = jnp.clip(jnp.sum(valid), min=1.0)
    batch = txt_embs.shape[0]
    total = jnp.sum(cost * weight * valid) / n_valid * batch
    active = (epoch < task3.end_epoch).astype(jnp.float32)
    return total * task3.retrieval_weight * active



def _task2_loss(txt_logits, vis_logits, labels, task2):
    """Concept-space auxiliary loss (task2 intent — see Task2Spec):
    stable BCE-with-logits of both heads against the video's multi-hot
    concept labels, plus an in-batch triplet over the configured concept
    similarity (hist = generalized Jaccard over sigmoid probabilities,
    reference ``measure_task2``), all scaled by alpha."""
    from ..ops import triplet_loss_from_scores
    from ..ops.similarity import hist_sim

    labels = labels.astype(jnp.float32)

    def bce(logits):
        per = optax.sigmoid_binary_cross_entropy(logits, labels)
        return jnp.mean(jnp.sum(per, axis=1))

    total = bce(vis_logits)
    if txt_logits is not None:
        total = total + bce(txt_logits)
        t_prob = jax.nn.sigmoid(txt_logits)
        v_prob = jax.nn.sigmoid(vis_logits)
        if task2.measure == "hist":
            scores = hist_sim(v_prob, t_prob)
        else:
            from ..ops.similarity import cosine_sim

            scores = cosine_sim(v_prob, t_prob)
        total = total + triplet_loss_from_scores(scores, cost_style="mean")
    return task2.alpha * total


def _jit_step(fn):
    """jit with the TrainState donated on accelerator backends: params and
    optimizer state update in place instead of allocating fresh buffers
    every step (~1 GB/step of allocation pressure at flagship dims). CPU
    ignores donation (and would warn), so donate only off-CPU."""
    if jax.default_backend() != "cpu":
        return jax.jit(fn, donate_argnums=(0,))
    return jax.jit(fn)


def _bind_step(transition, extras):
    """Jit a transition and bind its ``extras`` pytree (device-resident
    cache arrays, embedding tables) as a real ARGUMENT of every call.

    Closing the jit over multi-GB arrays instead would lower them as
    compile-time constants — the compiler then receives gigabytes of
    literals, which hangs remote-compile backends and bloats executables
    (observed: a 6.6 GB captured-constants warning from a cache-sized
    closure). Device-resident args are free to pass per call."""
    jitted = _jit_step(transition)

    def step(state, txt, vis, rng, false_txt_batch=None, task3_mask=None,
             epoch=0):
        return jitted(state, txt, vis, rng, false_txt_batch, task3_mask,
                      epoch, extras)

    step._transition = transition
    step._extras = extras
    return step


def make_train_step(model: LAFFModel, tx, spec):
    loss_fn = make_loss_fn(spec)

    def _transition(state: TrainState, txt_batch, vis_batch, rng,
                    false_txt_batch=None, task3_mask=None, epoch=0,
                    extras=None):
        def compute(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            if state.schedule:
                variables["schedule"] = state.schedule
            task2_labels = None
            if spec.task2 is not None:
                # labels ride the vis batch (keyed per video, so they flow
                # through the HBM feature cache and the scan stacks
                # untouched); the towers ignore unknown keys
                vis_in = dict(vis_batch)
                task2_labels = vis_in.pop("task2_labels")
                out, updates = model.apply(
                    variables, txt_batch, vis_in, train=True,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"] if state.batch_stats else [],
                    method=model.forward_with_concepts,
                )
                txt_embs, vis_embs, txt_conc, vis_conc = out
            else:
                out, updates = model.apply(
                    variables, txt_batch, vis_batch, train=True,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"] if state.batch_stats else [],
                )
                txt_embs, vis_embs = out
            loss = loss_fn(txt_embs, vis_embs)
            if spec.task2 is not None:
                loss = loss + _task2_loss(
                    txt_conc, vis_conc, task2_labels, spec.task2
                )
            if spec.task3 is not None and false_txt_batch is not None:
                stats = updates.get("batch_stats", state.batch_stats)
                false_vars = {"params": params}
                if stats:
                    false_vars["batch_stats"] = stats
                if state.schedule:
                    false_vars["schedule"] = state.schedule
                false_embs, _ = model.apply(
                    false_vars, false_txt_batch, train=True,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"] if stats else [],
                    method=model.encode_txt,
                )
                loss = loss + _masked_margin2(
                    txt_embs, vis_embs, false_embs,
                    jnp.asarray(task3_mask), spec.task3, jnp.asarray(epoch),
                )
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if (spec.txt.compute_dtype == "bfloat16"
                or spec.vis.compute_dtype == "bfloat16"):
            # reference float16/AMP parity: GradScaler skips the optimizer
            # step when grads are non-finite (model/model.py:983-989) so
            # one overflowed batch can't poison params or adam moments; BN
            # stats still update (they do in the reference's forward too)
            finite = jax.tree_util.tree_reduce(
                lambda a, g: jnp.logical_and(a, jnp.all(jnp.isfinite(g))),
                grads, jnp.bool_(True),
            )
            keep = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
                lambda a, b: jnp.where(finite, a, b), new, old
            )
            new_params = keep(new_params, state.params)
            new_opt_state = keep(new_opt_state, state.opt_state)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, loss

    return _bind_step(_transition, {})


def make_cached_train_step(train_step, cache_arrays):
    """Train step over a DeviceVisCache: takes (B,) int32 gallery rows
    instead of feature arrays and gathers them from HBM inside the jit —
    per-step host traffic drops to the text features plus a few hundred
    bytes of indices. The cache rides the ``extras`` argument (never a jit
    closure — see _bind_step)."""
    transition = train_step._transition

    def cached_transition(state, txt_batch, vis_idx, rng,
                          false_txt_batch=None, task3_mask=None, epoch=0,
                          extras=None):
        vis = {k: v[vis_idx] for k, v in extras["vis_cache"].items()}
        return transition(state, txt_batch, vis, rng, false_txt_batch,
                          task3_mask, epoch, extras)

    return _bind_step(
        cached_transition, {**train_step._extras, "vis_cache": cache_arrays}
    )


def make_txt_cached_train_step(train_step, txt_arrays):
    """Train step over a DeviceTxtCache: the text argument becomes (B,)
    int32 caption rows gathered from HBM inside the jit. Composed outside
    the vis cache and w2v-pooling wrappers, a training step's entire host
    traffic is two index vectors (~1 KB)."""
    transition = train_step._transition

    def txt_cached_transition(state, txt_idx, vis, rng,
                              false_txt_batch=None, task3_mask=None, epoch=0,
                              extras=None):
        txt = {k: v[txt_idx] for k, v in extras["txt_cache"].items()}
        return transition(state, txt, vis, rng, false_txt_batch,
                          task3_mask, epoch, extras)

    return _bind_step(
        txt_cached_transition, {**train_step._extras, "txt_cache": txt_arrays}
    )


def make_w2v_pooled_train_step(train_step, w2v_table):
    """Train step with device-side w2v mean pooling: text batches carry
    (B, T) int32 row ids + (B,) counts into a device-resident word-vector
    table (zero sink row for padding) instead of dense (B, D) means —
    the last fat per-step text transfer moves once, not every step. Row
    order matches the host gather's, so the pooled means track the host
    path to float rounding."""
    transition = train_step._transition
    table = w2v_table if isinstance(w2v_table, jnp.ndarray) else jnp.asarray(w2v_table)

    def pool(batch, table):
        if batch is None or "w2v_ids" not in batch:
            return batch
        batch = dict(batch)
        ids = batch.pop("w2v_ids")
        n = batch.pop("w2v_len")
        batch["w2v"] = table[ids].sum(axis=1) / n[:, None].astype(table.dtype)
        return batch

    def pooled_transition(state, txt_batch, vis, rng,
                          false_txt_batch=None, task3_mask=None, epoch=0,
                          extras=None):
        t = extras["w2v_table"]
        return transition(state, pool(txt_batch, t), vis, rng,
                          pool(false_txt_batch, t), task3_mask, epoch, extras)

    return _bind_step(
        pooled_transition, {**train_step._extras, "w2v_table": table}
    )


def make_multi_train_step(train_step, with_task3: bool = False):
    """K training steps in ONE device dispatch via ``lax.scan``.

    Each dispatch through a remote/tunneled runtime costs a fixed host
    round trip that can exceed the device step itself; scanning K steps
    device-side amortizes it (and lets XLA overlap weight updates with the
    next step's forward). Semantics are identical to K sequential
    ``train_step`` calls with the same per-step rngs — the state (params,
    BN stats, optimizer, step counter) threads through the scan carry.

    Batches arrive stacked on a leading (K, ...) axis; per-step rngs as a
    (K,) key array.
    """
    transition = train_step._transition
    extras = train_step._extras

    def multi_transition(state: TrainState, txt_stack, vis_stack, rngs,
                         false_stack=None, mask_stack=None, epoch=0,
                         extras=None):
        if with_task3:
            xs = (txt_stack, vis_stack, rngs, false_stack, mask_stack)

            def body(s, x):
                t, v, r, f, m = x
                return transition(s, t, v, r, f, m, epoch, extras)
        else:
            xs = (txt_stack, vis_stack, rngs)

            def body(s, x):
                t, v, r = x
                return transition(s, t, v, r, extras=extras)
        return jax.lax.scan(body, state, xs)

    jitted = _jit_step(multi_transition)

    def multi_step(state, txt_stack, vis_stack, rngs,
                   false_stack=None, mask_stack=None, epoch=0):
        return jitted(state, txt_stack, vis_stack, rngs, false_stack,
                      mask_stack, epoch, extras)

    return multi_step


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return state.replace(opt_state=opt_state)


def anneal_schedule(state: TrainState, decay_rate: float) -> TrainState:
    """Linear decay of every mean-pool residual weight (reference
    ``change_raw_global_emb_weight``: w += decay_rate - 1, clamped at 0)."""
    if not state.schedule:
        return state
    new_sched = jax.tree_util.tree_map(
        lambda w: jnp.maximum(w + decay_rate - 1.0, 0.0), state.schedule
    )
    return state.replace(schedule=new_sched)


def init_state(model, spec, prepared: Prepared, tx, seed: int = 2) -> TrainState:
    sample = next(iter(prepared.train_feed.epoch(0)))
    txt = {k: jnp.asarray(v[:2]) for k, v in sample["txt"].items()}
    vis = {k: jnp.asarray(v[:2]) for k, v in sample["vis"].items()}
    if "w2v_ids" in txt:
        # indexed w2v is pooled in the train-step wrapper, not the tower —
        # init sees the dense form
        ids = np.asarray(txt.pop("w2v_ids"))
        n = np.asarray(txt.pop("w2v_len"))
        txt["w2v"] = jnp.asarray(
            prepared.w2v_table[ids].sum(axis=1) / n[:, None]
        )
    init_kwargs = {}
    if spec.task2 is not None:
        # init through the task2 method so the concept heads' params exist
        # (flax only materializes submodules the init path actually runs);
        # the towers trace identically either way
        vis = {k: v for k, v in vis.items() if k != "task2_labels"}
        init_kwargs["method"] = model.forward_with_concepts
    variables = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        txt, vis, **init_kwargs,
    )
    params = variables["params"]
    if prepared.we is not None and "gru" in params.get("txt_net", {}):
        # word2vec-initialized embedding table (reference model.py:334-336)
        params = flax.core.unfreeze(params)
        params["txt_net"]["gru"]["we"] = jnp.asarray(prepared.we)
        params = flax.core.freeze(params) if isinstance(variables["params"], flax.core.FrozenDict) else params
    if getattr(spec.txt, "bert", None) is not None and "bert" in params.get("txt_net", {}):
        from ..models.bert import import_bert_params

        pre = import_bert_params(spec.txt.bert.name_or_path)
        if pre is not None:
            params = flax.core.unfreeze(params)
            params["txt_net"]["bert"] = jax.tree_util.tree_map(jnp.asarray, pre)
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        schedule=variables.get("schedule", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


class _NullScalarLogger:
    """Non-main processes of a multi-process run log nothing (all
    processes compute identical values; process 0 owns the files)."""

    def add_scalar(self, tag, value, step):
        pass

    def flush(self):
        pass

    def close(self):
        pass


class ScalarLogger:
    """TSV scalar log (always) + TensorBoard when opted in.

    TensorBoard is opt-in (LAFF_TPU_TENSORBOARD=1) because importing
    torch.utils.tensorboard can drag in TensorFlow, which contends with
    JAX for the TPU and deadlocks the first compile.
    """

    def __init__(self, logdir: str):  # noqa: D107 — see class docstring
        self.path = os.path.join(logdir, "scalars.tsv")
        self._fh = open(self.path, "a")
        self._tb = None
        if os.environ.get("LAFF_TPU_TENSORBOARD") == "1":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=logdir, flush_secs=5)
            except Exception:
                pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._fh.write(f"{step}\t{tag}\t{value}\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def flush(self):
        self._fh.flush()

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def _epoch_key_chain(epoch: int, n_steps: int, block: int = 256):
    """Per-step dropout keys for one epoch, served from the host.

    Semantically identical to the original per-batch
    ``rng, step_rng = jax.random.split(rng)`` chain seeded with
    ``jax.random.key(epoch)`` — the whole chain is reproduced inside ONE
    ``lax.scan`` dispatch and fetched as raw key data (16 KB for a
    2k-step epoch), instead of issuing one device dispatch per batch.
    Through a tunneled runtime those 2k tiny ``split`` dispatches were a
    measurable slice of the steady-epoch wall (the device work itself is
    batched into K-step scans, but the key chain was still per-batch).

    Yields (2,) uint32 rows (``jax.random.key_data`` layout); consumers
    rebuild typed keys with ``jax.random.wrap_key_data``. If a feed
    yields more batches than ``steps_per_epoch`` promised, the chain
    continues from the saved carry in ``block``-sized scans — still
    bit-identical to the sequential split sequence."""

    def chain(carry, _):
        pair = jax.random.split(carry)
        return pair[0], pair[1]

    def run(carry, length):
        c, keys = jax.lax.scan(chain, carry, None, length=length)
        return jax.random.key_data(c), jax.random.key_data(keys)

    run = jax.jit(run, static_argnums=1)
    carry = jax.random.key(epoch)
    carry_data, keys_data = run(carry, max(int(n_steps), 1))
    while True:
        host = np.asarray(keys_data)
        for row in host:
            yield row
        carry = jax.random.wrap_key_data(jnp.asarray(np.asarray(carry_data)))
        carry_data, keys_data = run(carry, block)


def _wrap_keys(rows):
    """(K, 2) uint32 host rows -> (K,) typed key array on device."""
    return jax.random.wrap_key_data(jnp.asarray(np.stack(rows)))


def _stack_batches(batches, key, bf16=False):
    names = batches[0][key].keys()
    out = {n: np.stack([b[key][n] for b in batches]) for n in names}
    if bf16:
        out = host_cast_bf16(out)
    return {n: jnp.asarray(v) for n, v in out.items()}


def train_one_epoch(train_step, state, feed, epoch, mesh=None, logger_=None,
                    log_every: int = 50, multi_step=None,
                    steps_per_dispatch: int = 1,
                    cast_txt_bf16: bool = False, cast_vis_bf16: bool = False,
                    vis_cache=None, txt_cache=None, prefetch_depth: int = 3):
    """One epoch. Losses stay on device until logging points — reading a
    scalar every step costs a host round trip that can dominate wall
    clock (observed 40ms step -> 500ms with per-step float(loss)).

    With ``multi_step`` (see make_multi_train_step) and
    ``steps_per_dispatch`` K > 1, same-shaped batches are stacked host-side
    and K steps run in one device dispatch; ragged tail batches fall back
    to single steps. Under a mesh, stacked (K, B, ...) batches shard over
    dp on axis 1 (the per-step batch axis)."""
    meter = AverageMeter()
    progress = Progress(feed.steps_per_epoch() * feed.batch_size, f"epoch {epoch}")
    step_keys = _epoch_key_chain(epoch, feed.steps_per_epoch())
    pending = []  # device loss values (scalars or (K,) stacks) awaiting readback
    pending_n = 0
    step0 = int(state.step)
    use_scan = multi_step is not None and steps_per_dispatch > 1
    buf = []

    def to_dev(arrs, bf16):
        if bf16:
            arrs = host_cast_bf16(arrs)
        return {k: jnp.asarray(v) for k, v in arrs.items()}

    def vis_arg(batch):
        if vis_cache is not None:
            return jnp.asarray(vis_cache.indices(batch["vis_ids"]))
        return to_dev(batch["vis"], cast_vis_bf16)

    def txt_arg(batch):
        if txt_cache is not None:
            return jnp.asarray(txt_cache.indices(batch["cap_ids"]))
        return to_dev(batch["txt"], cast_txt_bf16)

    def single_step(state, batch):
        txt = txt_arg(batch)
        vis = vis_arg(batch)
        step_rng = _wrap_keys([batch["_rng"]])[0]
        if mesh is not None:
            txt = shard_batch(txt, mesh, from_global=True)
            vis = shard_batch(vis, mesh, from_global=True)
        if "false_txt" in batch:
            false_txt = to_dev(batch["false_txt"], cast_txt_bf16)
            if mesh is not None:
                false_txt = shard_batch(false_txt, mesh, from_global=True)
            return train_step(
                state, txt, vis, step_rng,
                false_txt_batch=false_txt,
                task3_mask=jnp.asarray(batch["task3_mask"]),
                epoch=epoch,
            )
        return train_step(state, txt, vis, step_rng)

    def flush(state):
        nonlocal pending_n
        if not buf:
            return state
        if txt_cache is not None:
            same = len(buf) == steps_per_dispatch and all(
                len(b["cap_ids"]) == len(buf[0]["cap_ids"]) for b in buf
            )
        else:
            lead = buf[0]["txt"]
            same = len(buf) == steps_per_dispatch and all(
                b["txt"][k].shape == lead[k].shape for b in buf for k in lead
            )
        if use_scan and same:
            rngs = _wrap_keys([b["_rng"] for b in buf])
            if vis_cache is not None:
                vis_s = jnp.asarray(np.stack(
                    [vis_cache.indices(b["vis_ids"]) for b in buf]))
            else:
                vis_s = _stack_batches(buf, "vis", cast_vis_bf16)
            if txt_cache is not None:
                txt_s = jnp.asarray(np.stack(
                    [txt_cache.indices(b["cap_ids"]) for b in buf]))
            else:
                txt_s = _stack_batches(buf, "txt", cast_txt_bf16)
            if mesh is not None:
                # (K, B, ...) stacks: dp shards the per-step batch axis
                txt_s = shard_batch(txt_s, mesh, axis_index=1,
                                    from_global=True)
                vis_s = shard_batch(vis_s, mesh, axis_index=1,
                                    from_global=True)
            if "false_txt" in buf[0]:
                false_s = _stack_batches(buf, "false_txt", cast_txt_bf16)
                if mesh is not None:
                    false_s = shard_batch(false_s, mesh, axis_index=1,
                                          from_global=True)
                state, losses = multi_step(
                    state, txt_s, vis_s,
                    rngs, false_s,
                    jnp.asarray(np.stack([b["task3_mask"] for b in buf])),
                    epoch,
                )
            else:
                state, losses = multi_step(state, txt_s, vis_s, rngs)
            pending.append(losses)
            pending_n += len(buf)
        else:
            for b in buf:
                state, loss = single_step(state, b)
                pending.append(loss[None])
                pending_n += 1
        buf.clear()
        return state

    for i, batch in enumerate(Prefetcher(feed.epoch(epoch), depth=prefetch_depth)):
        batch["_rng"] = next(step_keys)
        if use_scan:
            buf.append(batch)
            if len(buf) >= steps_per_dispatch:
                state = flush(state)
        else:
            state, loss = single_step(state, batch)
            pending.append(loss[None])
            pending_n += 1
        progress.add(feed.batch_size)
        if pending_n >= log_every:
            vals = np.asarray(jnp.concatenate(pending))  # one sync per log_every
            for v in vals:
                meter.update(float(v))
            if logger_ is not None:
                logger_.add_scalar(
                    "train/Loss", float(vals[-1]), step0 + i + 1
                )
            pending = []
            pending_n = 0
    state = flush(state)
    if pending:
        vals = np.asarray(jnp.concatenate(pending))
        for v in vals:
            meter.update(float(v))
        if logger_ is not None:
            logger_.add_scalar("train/Loss", float(vals[-1]), int(state.step))
    return state, meter.avg


def main(opt, prepared: Optional[Prepared] = None, mesh=None) -> Dict:
    """Full training run (reference ``trainer.main``, ``trainer.py:315-443``)."""
    from .prepare import prepare
    from ..utils.misc import enable_compile_cache

    enable_compile_cache()

    t_prepare = time.time()
    if prepared is None:
        prepared = prepare(opt)
    prepare_seconds = time.time() - t_prepare
    config = prepared.config
    spec = prepared.spec
    model_path = prepared.model_path

    model = LAFFModel(spec)
    tx = make_optimizer(config, spec)
    state = init_state(model, spec, prepared, tx, seed=opt.random_seed)

    if opt.pretrained_file_path != "None":
        from .checkpoint import load_checkpoint

        ckpt = load_checkpoint(opt.pretrained_file_path)
        state = state.replace(
            params=ckpt["params"],
            batch_stats=ckpt.get("batch_stats") or state.batch_stats,
            schedule=ckpt.get("schedule") or state.schedule,
        )
        logger.info("warm-started from %s (epoch %s)", opt.pretrained_file_path,
                    ckpt.get("epoch"))

    raw_step = make_train_step(model, tx, spec)
    train_step = raw_step
    # bf16-compute towers round their inputs to bf16 as the first device op;
    # doing that rounding host-side is bit-identical and halves the feature
    # bytes moved per step (the bottleneck on bandwidth-starved links)
    cast_txt = spec.txt.compute_dtype == "bfloat16"
    cast_vis = spec.vis.compute_dtype == "bfloat16"
    if prepared.w2v_table is not None:
        table = prepared.w2v_table
        if mesh is not None:
            from ..parallel import replicate

            table = replicate(table, mesh)
        train_step = make_w2v_pooled_train_step(train_step, table)
    # -- device-resident epochs (on by default whenever HBM allows) --------
    # -1 = auto: cache whenever semantics are preserved and the estimate
    # fits the budget; caching is bit-identical to the fed path.
    budget = int(os.environ.get("LAFF_TPU_CACHE_BUDGET", 4 * 1024**3))
    # determinism is per side: task3 swaps CAPTIONS per epoch (negation
    # augmentation + false-caption resampling) but never the per-video
    # visual rows, so only the TEXT cache is gated by it. The visual feed
    # here is always deterministic: precomputed video features are static
    # and the frame-feature path truncates to the FIRST max_frame frames,
    # matching the reference (data_provider.py:476-477) —
    # config.frame_sample_type_train randomness only exists in the
    # raw-frame End2EndClip pipeline (engine/end2end.py), which has no
    # feature cache. (An earlier guard keyed the vis cache on that config
    # knob, silently declining auto-cache for every FrameLAFF config,
    # whose base default is 'random'.)
    txt_deterministic = spec.task3 is None
    from .feature_cache import (
        DeviceTxtCache, DeviceVisCache, estimate_txt_cache_bytes,
        estimate_vis_cache_bytes,
    )

    vis_cache = None
    want_vis = int(getattr(opt, "device_feature_cache", -1))
    if want_vis == -1:
        want_vis = int(
            estimate_vis_cache_bytes(
                prepared.train_feed.vis_batcher, bf16=cast_vis) <= budget
        )
    if want_vis:
        vis_cache = DeviceVisCache(
            prepared.train_feed.vis_batcher, bf16=cast_vis, mesh=mesh
        )
        train_step = make_cached_train_step(train_step, vis_cache.arrays)
    txt_cache = None
    want_txt = int(getattr(opt, "device_text_cache", -1))
    if want_txt == -1:
        want_txt = int(
            want_vis  # txt rows alone don't help while vis features stream
            and txt_deterministic
            and estimate_txt_cache_bytes(
                prepared.train_feed.text_batcher,
                cap_ids=prepared.train_feed.cap_ids, bf16=cast_txt,
            ) + (vis_cache.nbytes if vis_cache else 0) <= budget
        )
    if want_txt:
        if not txt_deterministic:
            raise ValueError(
                "--device_text_cache 1 is incompatible with task3 "
                "(negation augmentation substitutes captions per epoch, "
                "so a once-built HBM cache would go stale). Use 0 or -1 "
                "(auto)."
            )
        txt_cache = DeviceTxtCache(
            prepared.train_feed.text_batcher,
            cap_ids=prepared.train_feed.cap_ids, bf16=cast_txt, mesh=mesh,
        )
        train_step = make_txt_cached_train_step(train_step, txt_cache.arrays)
    # with both caches the feed only needs to emit id lists — skip the
    # host featurization work entirely
    prepared.train_feed.featurize_txt = txt_cache is None
    prepared.train_feed.featurize_vis = vis_cache is None
    multi_step = None
    spd = int(getattr(opt, "steps_per_dispatch", -1))
    if spd <= 0:
        # auto: scan only helps once batches are index-only (otherwise it
        # serializes host transfer against device compute); 8 steps per
        # dispatch amortizes dispatch latency without bloating compile time
        spd = min(8, max(1, prepared.train_feed.steps_per_epoch())) \
            if txt_cache is not None and vis_cache is not None else 1
    if spd > 1:
        multi_step = make_multi_train_step(
            train_step, with_task3=(spec.task3 is not None)
        )
    # reference num_workers (DataLoader host parallelism) maps to the feed
    # prefetch queue depth: how many batches the background featurizer
    # thread keeps in flight ahead of the device
    prefetch_depth = max(2, int(getattr(opt, "workers", 2)) + 1)
    if spd > 1 and txt_cache is not None and vis_cache is not None:
        # index-only batches (both HBM caches active) are a few KB each:
        # keep a whole K-step dispatch stack (+ slack) queued so the
        # feed thread assembles the NEXT stack while the main thread
        # blocks in the per-flush loss readback — otherwise the host
        # re-assembles most of each stack while the device sits idle
        # (measured ~5 s of a 17.9 s steady epoch at K=64, batch 64)
        prefetch_depth = max(prefetch_depth, spd + 2)
    # mesh divisibility: the dp axis (and any configured multiple) must
    # divide the batch so shard_batch produces equal per-device slices
    multiple = int(getattr(config, "device_batch_multiple", 1) or 1)
    if mesh is not None and "dp" in mesh.shape:
        multiple = max(multiple, mesh.shape["dp"])
    if opt.batch_size % multiple:
        raise ValueError(
            f"batch_size {opt.batch_size} must be a multiple of {multiple} "
            f"(config.device_batch_multiple / mesh 'dp' axis size)"
        )
    # multi-process (pod / DCN) runs: every process executes the same
    # epoch loop on identically-seeded feeds; device state is replicated
    # over the global mesh and only process 0 touches the filesystem
    multiproc = mesh is not None and jax.process_count() > 1
    is_main = jax.process_index() == 0
    if multiproc:
        from ..parallel import replicate

        state = replicate(state, mesh)
        logger.info("multi-process run: %d processes, %d global devices",
                    jax.process_count(), mesh.devices.size)

    lr_ctl = LRController(config.lr, config.lr_decay_rate)
    scalar_log = ScalarLogger(model_path) if is_main else _NullScalarLogger()

    val_txt_feed = EvalFeed(
        prepared.val_txt_source.cap_ids,
        prepared.val_txt_batcher,
        batch_size=getattr(config, "eval_batch_size", 1024),
    )
    val_vis_feed = EvalFeed(
        prepared.val_vis_ids,
        prepared.val_vis_batcher,
        batch_size=getattr(config, "eval_batch_size", 1024),
    )
    if getattr(opt, "stage_val_features", 1):
        # validation FEATURES are epoch-invariant — featurize + upload
        # once, replay from HBM every later epoch (evaluator staging;
        # budget-guarded, bit-identical to the unstaged path)
        val_txt_feed.stage_on_device = True
        val_vis_feed.stage_on_device = True

    best_perf = 0.0
    no_impr = 0
    mean_last: list = []
    hist_path = os.path.join(model_path, "val_perf_hist.txt")

    # task3: per-epoch re-evaluation on the negation caption subset,
    # logged as 'task3'-prefixed metrics (reference trainer.py:596-607;
    # diagnostic only — never feeds LR plateau / early stopping)
    negationset: Optional[set] = None
    neg_path = getattr(prepared, "negationset_path", None)
    if neg_path and os.path.exists(neg_path):
        with open(neg_path) as fh:
            negationset = {line.strip().split(" ", 1)[0]
                           for line in fh if line.strip()}
        logger.info("task3 negation validation subset: %d caption ids (%s)",
                    len(negationset), neg_path)
    elif neg_path:
        logger.warning("task3 negationset file missing, skipping the "
                       "in-training negation metrics: %s", neg_path)

    # full resume (params + optimizer + LR controller + counters) — the
    # reference can only warm-start weights (load_pretrained_model,
    # strict=False; no optimizer-state resume). Per-epoch determinism
    # (rng and shuffle keyed by epoch) makes a resumed run bit-identical
    # to an uninterrupted one.
    resume_path = os.path.join(model_path, "model_resume.pth.tar")
    start_epoch = 0
    resume_exists = os.path.exists(resume_path)
    if getattr(opt, "resume", 0) and multiproc:
        # the resume decision MUST be collective: only process 0 writes
        # model_resume.pth.tar, so on a non-shared filesystem a restart
        # would have process 0 resume at epoch N while the others start
        # fresh at epoch 0 — replicate() would then stamp a "replicated"
        # sharding onto per-process-DIFFERENT arrays and the diverging
        # epoch/early-stop counters end in wrong results or a collective
        # mismatch hang. Fail loudly instead: multi-process resume
        # requires model_path on a filesystem every process can read.
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            jnp.asarray([1 if resume_exists else 0], jnp.int32))
        if int(flags.min()) != int(flags.max()):
            raise RuntimeError(
                f"--resume with {jax.process_count()} processes: "
                f"{resume_path} is visible to only "
                f"{int(flags.sum())}/{jax.process_count()} processes. "
                "Multi-process resume requires model_path on a shared "
                "filesystem (process 0 owns the checkpoint writes).")
    if getattr(opt, "resume", 0) and resume_exists:
        from .checkpoint import load_checkpoint

        rk = load_checkpoint(resume_path)
        state = state.replace(
            params=rk["params"],
            batch_stats=rk["batch_stats"] or state.batch_stats,
            schedule=rk["schedule"] or state.schedule,
            opt_state=rk["opt_state"],
            step=jnp.asarray(rk["step"], jnp.int32),
        )
        if multiproc:
            from ..parallel import replicate

            state = replicate(state, mesh)
        lr_ctl.__dict__.update(rk["lr_ctl"])
        best_perf = rk["best_perf"]
        no_impr = rk["no_impr"]
        mean_last = rk.get("mean_last") or []
        start_epoch = rk["epoch"]
        logger.info("resumed from %s at epoch %d (best %.4f)",
                    resume_path, start_epoch, best_perf)
    hist = open(hist_path if is_main else os.devnull,
                "a" if start_epoch else "w")

    def ckpt_payload(epoch):
        # fetch to host HERE (main thread): device->host reads contend
        # with training dispatches, so they must not run concurrently with
        # the next epoch; the async saver then only pickles + writes
        host = lambda t: jax.tree_util.tree_map(np.asarray, t)  # noqa: E731
        return {
            "epoch": epoch + 1,
            "params": host(state.params),
            "batch_stats": host(state.batch_stats),
            "schedule": host(state.schedule),
            "best_perf": best_perf,
            "config": config,
            "opt": asdict(opt) if hasattr(opt, "__dataclass_fields__") else vars(opt),
            "spec": spec,
        }

    def resume_payload(epoch):
        payload = ckpt_payload(epoch)
        payload.update(
            opt_state=jax.tree_util.tree_map(np.asarray, state.opt_state),
            step=int(state.step),
            lr_ctl=dict(lr_ctl.__dict__),
            no_impr=no_impr,
            mean_last=mean_last,
        )
        return payload

    saver = _AsyncSaver()
    result = {"best_perf": best_perf, "epochs": start_epoch,
              "prepare_seconds": round(prepare_seconds, 1)}
    for epoch in range(start_epoch, opt.num_epochs):
        t_epoch = time.time()
        lr = lr_ctl.current()
        state = set_learning_rate(state, lr)
        state = anneal_schedule(state, config.txt_attention_global_decay_rate)
        scalar_log.add_scalar("train/learning_rate", lr, epoch)
        logger.info("Epoch %d/%d lr=%.6g", epoch, opt.num_epochs, lr)

        profile_dir = os.environ.get("LAFF_TPU_PROFILE")
        if profile_dir and epoch == 1:  # epoch 1: post-compile steady state
            jax.profiler.start_trace(profile_dir)
        t0 = time.time()
        state, train_loss = train_one_epoch(
            train_step, state, prepared.train_feed, epoch, mesh=mesh,
            logger_=scalar_log, multi_step=multi_step, steps_per_dispatch=spd,
            cast_txt_bf16=cast_txt, cast_vis_bf16=cast_vis,
            vis_cache=vis_cache, txt_cache=txt_cache,
            prefetch_depth=prefetch_depth,
        )
        if profile_dir and epoch == 1:
            jax.profiler.stop_trace()
            logger.info("profiler trace written to %s", profile_dir)
        if prepared.train2_feed is not None:
            state, _ = train_one_epoch(
                raw_step, state, prepared.train2_feed, epoch, mesh=mesh,
                logger_=scalar_log, multi_step=None, steps_per_dispatch=1,
                cast_txt_bf16=cast_txt, cast_vis_bf16=cast_vis,
            )
        epoch_time = time.time() - t0

        eval_vars = {"params": state.params}
        if state.batch_stats:
            eval_vars["batch_stats"] = state.batch_stats
        if state.schedule:
            eval_vars["schedule"] = state.schedule
        if multiproc:
            # replicated device arrays -> host; each process then runs the
            # identical validation on its local devices (deterministic, no
            # collectives, and np.asarray on sharded outputs stays legal)
            eval_vars = jax.tree_util.tree_map(np.asarray, eval_vars)
        metrics = validate(Embedder(model, eval_vars), val_txt_feed, val_vis_feed,
                           measure=spec.measure)
        cur_perf = metrics[opt.metric]
        for tag in ("r1", "r5", "r10", "medr", "meanr", "mir", "mAP"):
            scalar_log.add_scalar(f"val/{tag}", metrics[tag], epoch)
        logger.info(
            "epoch %d: loss=%.3f r1=%.2f r5=%.2f r10=%.2f medr=%.0f mir=%.4f "
            "(%.1fs)",
            epoch, train_loss, metrics["r1"], metrics["r5"], metrics["r10"],
            metrics["medr"], metrics["mir"], epoch_time,
        )
        hist.write("epoch_%d:\nText2Video(%s): %f\n" % (epoch, opt.metric, cur_perf))
        hist.flush()
        entry = {"epoch": epoch, "loss": float(train_loss), "lr": float(lr),
                 "train_seconds": round(epoch_time, 2),
                 **{k: float(metrics[k]) for k in
                    ("r1", "r5", "r10", "medr", "meanr", "mir", "mAP")}}
        if negationset is not None:
            sel = np.asarray([t in negationset for t in metrics["txt_ids"]])
            if sel.any():
                from ..eval.metrics import metrics_from_ranks

                t3 = dict(zip(
                    ("r1", "r5", "r10", "medr", "meanr", "mir", "mAP"),
                    metrics_from_ranks(np.asarray(metrics["ranks"])[sel]),
                ))
                for tag, v in t3.items():
                    scalar_log.add_scalar(f"task3val/{tag}", v, epoch)
                entry.update({f"task3_{k}": float(v) for k, v in t3.items()})
                logger.info(
                    "epoch %d negation subset (%d caps): r1=%.2f mir=%.4f",
                    epoch, int(sel.sum()), t3["r1"], t3["mir"],
                )
        result.setdefault("history", []).append(entry)

        lr_ctl.step(cur_perf)
        is_best = cur_perf > best_perf
        best_perf = max(cur_perf, best_perf)
        if is_main and is_best:
            # non-best epochs: the dance is a no-op during training
            # (only_best=False writes nothing), so skip the ~payload-sized
            # device->host pull entirely instead of fetching 300+ MB of
            # params per epoch for a submit that does nothing
            saver.submit(
                save_checkpoint_dance,
                ckpt_payload(epoch), True, logdir=model_path,
                filename=f"checkpoint_epoch_{epoch}.pth.tar",
            )

        if is_best:
            no_impr = 0
            mean_last = []
        elif opt.save_mean_last == 1:
            mean_last.append(jax.tree_util.tree_map(np.asarray, state.params))
            if len(mean_last) > 1 and is_main:
                payload = ckpt_payload(epoch)
                payload["params"] = average_states(mean_last)
                save_checkpoint(payload, os.path.join(model_path, "mean_last10.pth.tar"))

        no_impr += 1
        entry["wall_seconds"] = round(time.time() - t_epoch, 2)
        if getattr(opt, "resume", 0) and is_main:
            # a resumable run pays one full-state pickle (params + adam
            # moments) per epoch; plain runs skip it
            saver.submit(save_checkpoint, resume_payload(epoch), resume_path)
        if (no_impr > int(getattr(opt, "early_stop_patience", 10))
                or epoch == opt.num_epochs - 1):
            saver.join()
            if is_main:
                save_checkpoint_dance(
                    ckpt_payload(epoch), is_best=False, logdir=model_path,
                    filename=f"checkpoint_epoch_{epoch}.pth.tar", only_best=True,
                )
            logger.info("Early stopping or finished at epoch %d.", epoch)
            result["epochs"] = epoch + 1
            break

    saver.join()
    hist.close()
    scalar_log.close()
    message = "best performance on validation:\n Text to video(%s): %f" % (
        opt.metric, best_perf,
    )
    logger.info(message)
    if is_main:
        with open(os.path.join(model_path, "val_perf.txt"), "w") as fh:
            fh.write(message)
    result["best_perf"] = best_perf
    result["model_path"] = model_path
    return result
