"""Experiment orchestration: seed x hyperparameter sweeps of
train -> predict -> (AVS: xml -> infAP), replacing the reference shell
layer (``shell/retrieval_task.sh``, ``shell/avs_task.sh``).

The reference parallelized by round-robining independent single-GPU jobs
over a PID queue; on TPU one process owns the chip, so sweeps run
sequentially here (or one orchestrator per host for pod-slice fleets).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

from ..utils import get_logger
from .prepare import Options, model_dir_for

logger = get_logger(__name__)


@dataclasses.dataclass
class SweepOptions:
    trainCollection: str
    valCollection: str
    testCollection: str
    rootpath: str
    config_name: str
    parm_adjust_configs: List[str]
    random_seeds: List[int]
    val_set: str = "no"
    batch_size: int = 128
    num_epochs: int = 80
    overwrite: int = 0
    model_prefix_base: str = "runs_"
    result_file: str = "result_log/result_test.txt"
    trainCollection2: str = "None"
    save_mean_last: int = 0
    pretrained_file_path: str = "None"
    task3_caption: str = "no_task3_caption"
    # AVS mode (avs_task.sh): score query sets + TRECVID editions
    avs_query_sets: Optional[str] = None  # e.g. 'tv16.avs.txt,tv17.avs.txt'
    avs_editions: Optional[List[str]] = None  # e.g. ['tv16', 'tv17']
    checkpoints: List[str] = dataclasses.field(
        default_factory=lambda: ["model_best.pth.tar"]
    )
    # train all seeds of a parm config in ONE fused vmapped program
    # (engine/sweep.py) instead of sequential per-seed jobs — the TPU
    # answer to the reference's PID queue over a GPU list
    # (retrieval_task.sh:17-45)
    batch_seeds: bool = False


def retrieval_task(sweep: SweepOptions) -> Dict[str, Dict]:
    """Train + benchmark-predict over the sweep grid
    (``shell/retrieval_task.sh:118-197``)."""
    from . import trainer
    from .predictor import PredictOptions, main as predict_main

    sweep_trained = set()  # (seed, parm) combos the fused sweep handled
    if (sweep.batch_seeds and len(sweep.random_seeds) > 1
            and sweep.trainCollection2 == "None"):
        # pre-train all seeds of each parm config in one fused program;
        # the per-seed loop below then finds model_best present and goes
        # straight to prediction
        from .sweep import sweep_main

        for parm in sweep.parm_adjust_configs:
            pending = []
            for seed in sweep.random_seeds:
                probe = Options(
                    trainCollection=sweep.trainCollection,
                    valCollection=sweep.valCollection,
                    rootpath=sweep.rootpath,
                    val_set=sweep.val_set,
                    config_name=sweep.config_name,
                    model_prefix=f"{sweep.model_prefix_base}{parm}_seed_{seed}",
                )
                best = os.path.join(model_dir_for(probe), "model_best.pth.tar")
                if sweep.overwrite or not os.path.exists(best):
                    pending.append(seed)
            if len(pending) < 2:
                continue  # a single pending seed trains in the loop below
            base_opt = Options(
                trainCollection=sweep.trainCollection,
                valCollection=sweep.valCollection,
                rootpath=sweep.rootpath,
                val_set=sweep.val_set,
                config_name=sweep.config_name,
                parm_adjust_config=parm,
                batch_size=sweep.batch_size,
                num_epochs=sweep.num_epochs,
                model_prefix=f"{sweep.model_prefix_base}{parm}",
                overwrite=sweep.overwrite,
                save_mean_last=sweep.save_mean_last,
                pretrained_file_path=sweep.pretrained_file_path,
                task3_caption=sweep.task3_caption,
            )
            logger.info("batched seed sweep: parm=%s seeds=%s", parm, pending)
            sweep_main(base_opt, pending)
            sweep_trained.update((s, parm) for s in pending)
    elif sweep.batch_seeds:
        logger.info("batch_seeds requested but not applicable "
                    "(single seed or trainCollection2); using per-seed jobs")

    results: Dict[str, Dict] = {}
    for seed in sweep.random_seeds:
        for parm in sweep.parm_adjust_configs:
            prefix = f"{sweep.model_prefix_base}{parm}_seed_{seed}"
            opt = Options(
                trainCollection=sweep.trainCollection,
                valCollection=sweep.valCollection,
                rootpath=sweep.rootpath,
                val_set=sweep.val_set,
                config_name=sweep.config_name,
                parm_adjust_config=parm,
                random_seed=seed,
                batch_size=sweep.batch_size,
                num_epochs=sweep.num_epochs,
                model_prefix=prefix,
                overwrite=sweep.overwrite,
                trainCollection2=sweep.trainCollection2,
                save_mean_last=sweep.save_mean_last,
                pretrained_file_path=sweep.pretrained_file_path,
                task3_caption=sweep.task3_caption,
            )
            best_ckpt = os.path.join(model_dir_for(opt), "model_best.pth.tar")
            if (seed, parm) in sweep_trained:
                # trained by the fused sweep THIS invocation — never
                # re-train it here, even under --overwrite
                train_result = {"model_path": model_dir_for(opt),
                                "skipped": True, "batched": True}
            elif os.path.exists(best_ckpt) and not sweep.overwrite:
                logger.info("%s exists; skipping training", best_ckpt)
                train_result = {"model_path": model_dir_for(opt), "skipped": True}
            else:
                train_result = trainer.main(opt)
            model_dir = model_dir_for(opt)

            train_tag = sweep.trainCollection
            if sweep.trainCollection2 != "None":
                train_tag += "_" + sweep.trainCollection2
            sim_parts = [train_tag, sweep.valCollection]
            if sweep.val_set != "no":
                sim_parts.append(sweep.val_set)
            sim_parts.append(sweep.config_name)
            sim_name = os.path.join(*sim_parts)

            # evaluate every requested checkpoint (reference avs_task.sh
            # loops model_best and mean_last10, avs_task.sh:169-259)
            preds = {}
            for ckpt_name in sweep.checkpoints:
                ckpt_path = os.path.join(model_dir, ckpt_name)
                if not os.path.exists(ckpt_path):
                    logger.info("checkpoint %s absent; skipping", ckpt_path)
                    continue
                tag = ckpt_name.replace(".pth.tar", "")
                popt = PredictOptions(
                    testCollection=sweep.testCollection,
                    model_path=ckpt_path,
                    sim_name=os.path.join(sim_name, tag) if len(
                        sweep.checkpoints) > 1 else sim_name,
                    rootpath=sweep.rootpath,
                    overwrite=1,
                    query_sets=(
                        sweep.avs_query_sets
                        or f"{sweep.testCollection}.caption.txt"
                    ),
                    predict_result_file=sweep.result_file,
                    batch_size=max(sweep.batch_size, 256),
                )
                preds[tag] = predict_main(popt)
            pred = preds.get("model_best", next(iter(preds.values())) if preds else {})
            results[prefix] = {"train": train_result, "predict": pred,
                               "predict_all": preds}
    return results


def avs_task(sweep: SweepOptions) -> Dict[str, Dict]:
    """Train + AVS-score + TRECVID infAP over editions and checkpoints
    (``shell/avs_task.sh:169-259``)."""
    from ..eval.trecvid import evaluate_xml, scores_to_xml
    from .predictor import PredictOptions, main as predict_main

    results = retrieval_task(sweep)
    if not sweep.avs_editions:
        return results

    for prefix, res in results.items():
        # every scored checkpoint gets the full xml -> infAP chain, like
        # the reference's editions x {model_best, mean_last10} loop
        # (avs_task.sh:169-259); res['infAP'] keeps the model_best view
        res["infAP_all"] = {}
        for tag, pred_set in res.get("predict_all", {}).items():
            per_edition = res["infAP_all"].setdefault(tag, {})
            for query_set, pred in pred_set.items():
                score_file = pred.get("score_file")
                if not score_file:
                    continue
                edition = query_set.split(".")[0]  # 'tv16.avs.txt' -> 'tv16'
                if edition not in (sweep.avs_editions or []):
                    continue
                topics = os.path.join(
                    sweep.rootpath, sweep.testCollection, "TextData", query_set
                )
                shots = os.path.join(
                    sweep.rootpath, sweep.testCollection, "VideoSets",
                    f"{sweep.testCollection}.txt",
                )
                xml = scores_to_xml(
                    score_file,
                    topics_file=topics if os.path.exists(topics) else None,
                    shots_file=shots if os.path.exists(shots) else None,
                    overwrite=True,
                )
                qrels = os.path.join(
                    sweep.rootpath, sweep.testCollection, "TextData",
                    f"avs.qrels.{edition}",
                )
                if os.path.exists(qrels):
                    per_edition[edition] = evaluate_xml(
                        xml, qrels, overwrite=True)
                    logger.info("%s %s %s infAP=%.4f", prefix, tag, edition,
                                per_edition[edition])
        res["infAP"] = res["infAP_all"].get(
            "model_best",
            next(iter(res["infAP_all"].values())) if res["infAP_all"] else {},
        )
    return results
