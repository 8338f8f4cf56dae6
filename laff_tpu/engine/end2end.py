"""End2EndClip training driver (reference End2EndClip flow,
``model/model.py:2261-2498`` + the frame_loader data path).

Raw video frames + raw captions through live CLIP towers: captions BPE-
tokenize in the feed; frames load via ImageSource (``id.imagepath.txt``).
The optimizer applies the reference's lr/20 rule to tower parameters when
fine-tuning (frozen=False); frozen mode trains nothing inside CLIP (the
reference's torch.no_grad blocks) — useful only with extra heads, so the
practical configurations are frozen precomputed-feature LAFF (elsewhere)
or full fine-tune here.
"""

from __future__ import annotations

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..data.end2end import End2EndFeed, eval_batches
from ..data.frames import ImageSource
from ..data.sources import TextSource, read_video_set
from ..models.clip import ClipTextConfig, ClipVisionConfig, tokenize
from ..models.end2end_clip import End2EndClip, clip_param_labels
from ..ops import triplet_loss
from ..utils import get_logger, makedirs
from .checkpoint import save_checkpoint_dance
from .evaluator import Embedder, t2v_ranks
from ..eval.metrics import metrics_from_ranks
from .prepare import load_config, model_dir_for
from .trainer import LRController, ScalarLogger

logger = get_logger(__name__)


def _tower_configs(config):
    tc = getattr(config, "clip_text_config", {})
    vc = getattr(config, "clip_vision_config", {})
    return ClipTextConfig(**tc) if tc else ClipTextConfig(), (
        ClipVisionConfig(**vc) if vc else ClipVisionConfig()
    )


def build_model(config) -> End2EndClip:
    text_cfg, vision_cfg = _tower_configs(config)
    return End2EndClip(
        text_config=text_cfg, vision_config=vision_cfg,
        frozen=config.clip_opt.get("frozen", False),
    )


def main(opt, mesh=None) -> Dict:
    config = load_config(opt.config_name)
    if opt.parm_adjust_config != "None":
        config.adjust_parm(opt.parm_adjust_config)
    model_path = model_dir_for(opt)
    makedirs(model_path)
    rootpath = os.path.expanduser(opt.rootpath)
    val_set = "" if opt.val_set == "no" else opt.val_set

    text_cfg, vision_cfg = _tower_configs(config)
    model = build_model(config)

    train_caps = os.path.join(rootpath, opt.trainCollection, "TextData",
                              f"{opt.trainCollection}.caption.txt")
    val_caps = os.path.join(rootpath, opt.valCollection, "TextData", val_set,
                            f"{opt.valCollection}.caption.txt")
    train_images = ImageSource(
        os.path.join(rootpath, opt.trainCollection, "id.imagepath.txt"),
        sample_frame=config.sample_frame,
        sample_type=config.frame_sample_type_train,
        image_size=vision_cfg.image_size,
    )
    val_images = ImageSource(
        os.path.join(rootpath, opt.valCollection, "id.imagepath.txt"),
        sample_frame=config.sample_frame,
        sample_type=config.frame_sample_type_test,
        image_size=vision_cfg.image_size,
    )
    feed = End2EndFeed(
        TextSource(train_caps), train_images, batch_size=opt.batch_size,
        seed=opt.random_seed, context_length=text_cfg.context_length,
    )
    val_tsource = TextSource(val_caps)
    val_vis_ids = read_video_set(
        os.path.join(rootpath, opt.valCollection, "VideoSets",
                     opt.valCollection + ".txt")
    )

    sample = next(iter(feed.epoch(0)))
    variables = model.init(
        jax.random.key(opt.random_seed),
        {k: jnp.asarray(v[:2]) for k, v in sample["txt"].items()},
        {k: jnp.asarray(v[:2]) for k, v in sample["vis"].items()},
    )
    params = variables["params"]

    # reference lr/20 for tower params when fine-tuning (model.py:2013-2019)
    labels = clip_param_labels(params)
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(config.grad_clip or 2.0),
            optax.multi_transform(
                {"clip": optax.adam(learning_rate / 20.0, eps=1e-4),
                 "usual": optax.adam(learning_rate, eps=1e-4)},
                labels,
            ),
        )
    )(learning_rate=config.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, txt, vis):
        def loss_fn(p):
            t, v = model.apply({"params": p}, txt, vis, train=True)
            return triplet_loss(
                t, v, margin=config.margin, direction=config.direction,
                max_violation=config.max_violation, cost_style=config.cost_style,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # validation inputs are epoch-invariant (tokenized captions +
    # decoded/preprocessed frames — the frame decode alone costs seconds
    # per epoch): featurize once, and stage on device when they fit the
    # byte budget so later epochs replay from HBM. Opt-out via
    # ``--stage_val_features 0`` (same flag as trainer.py/sweep.py); when
    # staging is off — or the byte budget overflows — validation batches
    # are REGENERATED lazily each epoch rather than pinned in host RAM
    # (decoded f32 frames can be multi-GB at larger galleries).
    stage_val = bool(int(getattr(opt, "stage_val_features", 1) or 0))

    def _stage_items(make_batches):
        if not stage_val:
            return make_batches  # lazy: per-epoch streaming, nothing pinned
        budget = int(os.environ.get("LAFF_TPU_EVAL_STAGE_BUDGET", 4 * 1024**3))
        staged, total = [], 0
        for item in make_batches():
            dev = {k: jnp.asarray(v) for k, v in item["data"].items()}
            total += sum(v.nbytes for v in dev.values())
            if total > budget:
                logger.info(
                    "not staging end2end val feed: %d batches exceed the "
                    "%d-byte budget (LAFF_TPU_EVAL_STAGE_BUDGET to raise); "
                    "falling back to per-epoch streaming", len(staged) + 1,
                    budget)
                return make_batches  # lazy fallback; drop what we staged
            staged.append({**item, "data": dev})
        return staged

    val_txt_items = _stage_items(lambda: eval_batches(
        val_tsource.cap_ids,
        lambda ids: {"clip_ids": tokenize(val_tsource.captions_for(ids),
                                          text_cfg.context_length)},
        opt.batch_size,
    ))
    val_vis_items = _stage_items(lambda: eval_batches(
        val_vis_ids,
        lambda ids: {"frames": val_images.batch(ids)},
        max(opt.batch_size // 4, 1),
    ))

    def validate(params) -> float:
        embedder = Embedder(model, {"params": params})

        def collect(items, fn):
            chunks, ids = [], []
            for item in (items() if callable(items) else items):
                emb = fn(embedder.variables,
                         {k: jnp.asarray(v) for k, v in item["data"].items()})
                chunks.append(emb[: item["valid"]])
                ids.extend(item["ids"])
            return jnp.concatenate(chunks), ids

        txt_embs, txt_ids = collect(val_txt_items, embedder._txt)
        vis_embs, vis_ids = collect(val_vis_items, embedder._vis)
        ranks = t2v_ranks(txt_embs, vis_embs, txt_ids, vis_ids)
        return metrics_from_ranks(ranks)

    lr_ctl = LRController(config.lr, config.lr_decay_rate)
    scalar_log = ScalarLogger(model_path)
    best_perf = 0.0
    no_impr = 0
    result = {"best_perf": 0.0, "model_path": model_path}
    for epoch in range(opt.num_epochs):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr_ctl.current(), jnp.float32
        )
        t0 = time.time()
        losses = []
        for batch in feed.epoch(epoch):
            txt = {k: jnp.asarray(v) for k, v in batch["txt"].items()}
            vis = {k: jnp.asarray(v) for k, v in batch["vis"].items()}
            params, opt_state, loss = train_step(params, opt_state, txt, vis)
            losses.append(loss)
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0

        metrics = validate(params)
        cur = metrics[5]  # mir
        logger.info(
            "epoch %d: loss=%.3f r1=%.2f r5=%.2f medr=%.0f mir=%.4f (%.1fs)",
            epoch, train_loss, metrics[0], metrics[1], metrics[3], cur,
            time.time() - t0,
        )
        scalar_log.add_scalar("val/mir", cur, epoch)
        lr_ctl.step(cur)
        is_best = cur > best_perf
        best_perf = max(cur, best_perf)
        save_checkpoint_dance(
            {"epoch": epoch + 1, "params": params, "batch_stats": {},
             "schedule": {}, "best_perf": best_perf, "config": config,
             "opt": vars(opt) if not isinstance(opt, dict) else opt,
             "spec": None, "model_name": "End2EndClip"},
            is_best, logdir=model_path,
            filename=f"checkpoint_epoch_{epoch}.pth.tar",
        )
        no_impr = 0 if is_best else no_impr + 1
        if no_impr > 10 or epoch == opt.num_epochs - 1:
            save_checkpoint_dance(
                {}, is_best=False, logdir=model_path, only_best=True,
            )
            break
    scalar_log.close()
    result["best_perf"] = best_perf
    return result
