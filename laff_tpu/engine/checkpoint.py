"""Checkpointing: pytree state + pickled config, reference-compatible
best-model dance.

Format: a single pickle holding numpy-converted variable collections plus
the config/opt metadata — the JAX analog of the reference's
``{'epoch','model','best_perf','config','opt'}`` torch dict
(``trainer.py:370-372``). Files keep the reference naming
(``model_best.pth.tar`` etc.) so the shell layer and predictor CLIs work
unchanged; the payload is sniffed on load, and genuine reference torch
checkpoints are routed to the importer in laff_tpu.engine.torch_import.
"""

from __future__ import annotations

import os
import pickle
import shutil
from typing import Any, Dict

import jax
import numpy as np

from ..utils import get_logger

logger = get_logger(__name__)

_MAGIC = "laff_tpu_ckpt_v1"


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(state: Dict[str, Any], path: str) -> None:
    payload = dict(state)
    payload["__format__"] = _MAGIC
    for key in ("params", "batch_stats", "schedule"):
        if key in payload and payload[key] is not None:
            payload[key] = _to_numpy(payload[key])
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(payload, fh, pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a laff_tpu checkpoint; reference torch checkpoints and orbax
    checkpoint directories are detected and routed transparently."""
    if os.path.isdir(path):
        return _load_checkpoint_orbax(path)
    with open(path, "rb") as fh:
        head = fh.read(2)
    if head == b"PK":  # torch zipfile serialization
        from .torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path)
    with open(path, "rb") as fh:
        payload = pickle.load(fh)
    if payload.get("__format__") != _MAGIC:
        raise ValueError(f"{path}: not a laff_tpu checkpoint")
    return payload


_ORBAX_META = "meta.pkl"
_ORBAX_ARRAYS = "arrays"


def save_checkpoint_orbax(state: Dict[str, Any], path: str) -> None:
    """Directory-format checkpoint via orbax (async-capable, sharded-array
    aware — the right backend once params outgrow a single pickle, e.g.
    End2End towers on a pod slice). Arrays go through orbax's OCDBT store;
    non-array metadata (config/opt/spec) rides in a side pickle.

    ``load_checkpoint`` sniffs directories and restores transparently, so
    the trainer/predictor surface is unchanged.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    arrays = {
        k: _to_numpy(state[k])
        for k in ("params", "batch_stats", "schedule")
        if state.get(k)
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, _ORBAX_ARRAYS), arrays, force=True)
    ckptr.wait_until_finished()
    meta = {k: v for k, v in state.items()
            if k not in ("params", "batch_stats", "schedule")}
    meta["__format__"] = _MAGIC
    meta["__empty__"] = [k for k in ("params", "batch_stats", "schedule")
                         if not state.get(k)]
    with open(os.path.join(path, _ORBAX_META), "wb") as fh:
        pickle.dump(meta, fh, pickle.HIGHEST_PROTOCOL)


def _load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with open(os.path.join(path, _ORBAX_META), "rb") as fh:
        payload = pickle.load(fh)
    ckptr = ocp.StandardCheckpointer()
    arrays = ckptr.restore(os.path.join(os.path.abspath(path), _ORBAX_ARRAYS))
    payload.update(arrays)
    for k in payload.pop("__empty__", []):
        payload.setdefault(k, {})
    return payload


def save_checkpoint_dance(
    state: Dict[str, Any],
    is_best: bool,
    logdir: str,
    filename: str = "checkpoint.pth.tar",
    only_best: bool = False,
) -> None:
    """Reference best-model protocol (``trainer.py:626-645``): best epochs
    are staged as model_temp_best; at training end the staged file becomes
    model_best and the stage is removed."""
    resfile = os.path.join(logdir, filename)
    if is_best:
        save_checkpoint(state, resfile)
        shutil.copyfile(resfile, os.path.join(logdir, "model_temp_best.pth.tar"))
        os.remove(resfile)
    if only_best:
        staged = os.path.join(logdir, "model_temp_best.pth.tar")
        best = os.path.join(logdir, "model_best.pth.tar")
        if os.path.exists(staged):
            shutil.copyfile(staged, best)
            os.remove(staged)
        elif not os.path.exists(best):
            # a RESUMED run that never beat the pre-interrupt best has no
            # staged file and no materialized best either (the reference
            # can't hit this: its fresh runs always improve at epoch 0);
            # fall back to the current weights rather than crashing
            save_checkpoint(state, best)


def average_states(states) -> Dict[str, Any]:
    """Uniform parameter average (mean_last10, reference
    ``trainer.py:410-424``)."""
    n = len(states)
    out = states[0]
    for other in states[1:]:
        out = jax.tree_util.tree_map(lambda a, b: a + b, out, other)
    return jax.tree_util.tree_map(lambda a: a / n, out)
