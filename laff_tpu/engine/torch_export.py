"""Export laff_tpu checkpoints to the reference PyTorch state-dict layout.

The inverse of laff_tpu.engine.torch_import: our flax pytrees map back to
the reference module names so a model trained here can be evaluated (or
further fine-tuned) by the original PyTorch codebase. Covers the LAFF /
FrameLAFF families (the headline configs); the per-head gate rows are
unstacked back into ``attention_layer.<h>.embedding_common.0.*`` entries
and BN batch_stats back into running_mean/running_var.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..models.laff import _safe
from ..utils import get_logger
from .torch_import import _TXT_ENCODER_NAMES

logger = get_logger(__name__)


def _np(x):
    return np.asarray(x)


def _export_transform(params: Dict, stats: Dict, sd: Dict, prefix: str):
    if "fc1" in params:
        sd[prefix + "fc1.weight"] = _np(params["fc1"]["kernel"]).T
        sd[prefix + "fc1.bias"] = _np(params["fc1"]["bias"])
    if "bn1" in params:
        sd[prefix + "bn1.weight"] = _np(params["bn1"]["scale"])
        sd[prefix + "bn1.bias"] = _np(params["bn1"]["bias"])
        bn_stats = (stats or {}).get("bn1", {})
        sd[prefix + "bn1.running_mean"] = _np(
            bn_stats.get("mean", np.zeros_like(params["bn1"]["bias"]))
        )
        sd[prefix + "bn1.running_var"] = _np(
            bn_stats.get("var", np.ones_like(params["bn1"]["scale"]))
        )
        sd[prefix + "bn1.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _export_multihead_gate(attn: Dict, sd: Dict, prefix: str, g: float):
    kernel = _np(attn["gate_kernel"])  # (H, dh)
    bias = _np(attn["gate_bias"])  # (H,)
    for h in range(kernel.shape[0]):
        base = f"{prefix}attention_layer.{h}."
        sd[base + "embedding_common.0.weight"] = kernel[h][None, :]
        sd[base + "embedding_common.0.bias"] = bias[h][None]
        sd[base + "global_emb_weight_net.weight"] = np.asarray(
            [[g]], dtype=np.float32
        )


def export_state_dict(ckpt: Dict) -> Dict[str, np.ndarray]:
    """laff_tpu checkpoint payload -> reference-named state dict (numpy
    values; wrap in torch tensors for torch.save)."""
    params = ckpt["params"]
    stats = ckpt.get("batch_stats") or {}
    schedule = ckpt.get("schedule") or {}
    spec = ckpt["spec"]
    sd: Dict[str, np.ndarray] = {}

    # tied cross-tower fcs (txt_fc_same_with_vis_fc) materialize into BOTH
    # towers' fc1 slots — the reference's tie is effectively untied
    # (its multi-head module swap is a no-op), so its loader expects
    # per-tower copies
    txt_tied: Dict[str, Dict] = {}
    vis_tied: Dict[str, Dict] = {}
    for txt_name, vis_name in getattr(spec, "tied_transforms", ()) or ():
        shared = params.get(f"tied_fc_{_safe(txt_name)}_{_safe(vis_name)}")
        if shared is not None:
            txt_tied[txt_name] = shared
            vis_tied[vis_name] = shared

    def _with_tied(tower_params, name, tied):
        if name in tied and "fc1" not in tower_params:
            return {**tower_params, "fc1": tied[name]}
        return tower_params

    # text tower
    tp = params.get("txt_net", {})
    ts = stats.get("txt_net", {})
    for name, _dim in spec.txt.features:
        key = f"transform_{_safe(name)}"
        if key in tp or name in txt_tied:
            enc = _TXT_ENCODER_NAMES.get(name, name)
            _export_transform(
                _with_tied(tp.get(key, {}), name, txt_tied), ts.get(key), sd,
                f"txt_net.transform_layer.{enc}_transform.",
            )
    if "gru" in tp:
        gru = tp["gru"]
        sd["txt_net.encoder.rnn_encoder.we.weight"] = _np(gru["we"])
        for ours, ref in [("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                          ("b_ih", "bias_ih"), ("b_hh", "bias_hh")]:
            for layer in range(spec.txt.gru.rnn_layer if spec.txt.gru else 1):
                k = f"{ours}_l{layer}"
                if k in gru:
                    sd[f"txt_net.encoder.rnn_encoder.rnn.{ref}_l{layer}"] = _np(gru[k])
                if k + "_rev" in gru:
                    sd[f"txt_net.encoder.rnn_encoder.rnn.{ref}_l{layer}_reverse"] = _np(
                        gru[k + "_rev"]
                    )
    if "expert_embedding" in tp:
        sd["txt_net.expert_embedding.weight"] = _np(tp["expert_embedding"])
    if "attention" in tp:
        g = float(
            np.asarray(
                schedule.get("txt_net", {}).get("attention", {}).get(
                    "global_emb_weight", 1.0
                )
            )
        )
        _export_multihead_gate(tp["attention"], sd, "txt_net.attention_layer.", g)

    # visual tower (LAFF layout or FrameLAFF layout)
    vp = params.get("vis_net", {})
    vs = stats.get("vis_net", {})
    frame_laff = bool(spec.vis.frame_features)
    t_prefix = "vis_net." if frame_laff else "vis_net.VisMutiTransformNet."
    a_prefix = "vis_net.vis_attention_layer." if frame_laff else "vis_net.attention_layer."
    vis_feats = list(spec.vis.features) + list(spec.vis.frame_features)
    for name, _dim in vis_feats:
        key = f"transform_{_safe(name)}"
        if key in vp or name in vis_tied:
            _export_transform(_with_tied(vp.get(key, {}), name, vis_tied),
                              vs.get(key), sd, f"{t_prefix}{name}.")
    if "expert_embedding" in vp:
        sd["vis_net.expert_embedding.weight"] = _np(vp["expert_embedding"])
    if "attention" in vp:
        g = float(
            np.asarray(
                schedule.get("vis_net", {}).get("attention", {}).get(
                    "global_emb_weight", 1.0
                )
            )
        )
        _export_multihead_gate(vp["attention"], sd, a_prefix, g)

    # FrameLAFF frame attentions
    for fname, _dim in spec.vis.frame_features:
        fkey = f"frame_attn_{_safe(fname)}"
        base = f"vis_net.frame_attention.{fname}."
        idx = "0."
        fc_key = f"frame_fc_{_safe(fname)}"
        if fc_key in vp:
            sd[base + "0.weight"] = _np(vp[fc_key]["kernel"]).T
            sd[base + "0.bias"] = _np(vp[fc_key]["bias"])
            idx = "1."
        if fkey in vp:
            attn = vp[fkey]
            g = float(
                np.asarray(
                    schedule.get("vis_net", {}).get(fkey, {}).get(
                        "global_emb_weight", 1.0
                    )
                )
            )
            if "gate_kernel" in attn:
                _export_multihead_gate(attn, sd, base + idx, g)
            else:
                sd[base + idx + "embedding_common.0.weight"] = _np(
                    attn["gate"]["kernel"]
                ).T
                sd[base + idx + "embedding_common.0.bias"] = _np(
                    attn["gate"]["bias"]
                )
                sd[base + idx + "global_emb_weight_net.weight"] = np.asarray(
                    [[g]], dtype=np.float32
                )
    if "task2_vis_head" in params or "task2_txt_head" in params:
        # no reference counterpart exists: the reference never instantiates
        # task2 modules (its task2 loss is dead code), so these heads stay
        # laff_tpu-only and the exported retrieval towers are complete
        logger.warning(
            "task2 concept heads present but NOT exported (the reference "
            "has no task2 modules); retrieval towers exported in full"
        )
    return sd


def save_torch_checkpoint(ckpt: Dict, path: str) -> None:
    """Write a reference-loadable .pth.tar (state dict + metadata)."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, copy=True)) for k, v in
          export_state_dict(ckpt).items()}
    torch.save(
        {
            "epoch": ckpt.get("epoch", 0),
            "model": sd,
            "best_perf": ckpt.get("best_perf", 0.0),
            "config": ckpt.get("config"),
            "opt": ckpt.get("opt"),
        },
        path,
    )
    logger.info("exported reference-format checkpoint to %s", path)
