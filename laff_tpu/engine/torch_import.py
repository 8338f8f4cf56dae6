"""Reference PyTorch checkpoint importer.

Maps the reference state-dict layout (``model/model.py`` module tree) onto
our flax pytree so published ``.pth.tar`` checkpoints evaluate unchanged:

  txt side (MultiScaleTxtEncoderAttention):
    txt_net.encoder.rnn_encoder.we.weight            -> txt_net/gru/we
    txt_net.encoder.rnn_encoder.rnn.weight_ih_l0     -> txt_net/gru/w_ih_l0
    txt_net.transform_layer.<enc>_transform.fc1.*    -> txt_net/transform_<k>/fc1
    txt_net.transform_layer.<enc>_transform.bn1.*    -> params scale/bias +
                                                        batch_stats mean/var
    txt_net.attention_layer.attention_layer.<h>.embedding_common.0.*
                                                     -> txt_net/attention/gate_{kernel,bias}[h]
    txt_net.attention_layer.attention_layer.0.global_emb_weight_net.weight
                                                     -> schedule global_emb_weight
    txt_net.expert_embedding.weight                  -> txt_net/expert_embedding

  vis side, LAFF (VisMutiTransformNetAddAttnetion):
    vis_net.VisMutiTransformNet.<feat>.fc1/bn1.*     -> vis_net/transform_<feat>
    vis_net.attention_layer...                       -> vis_net/attention

  vis side, FrameLAFF (VisMutiTransformNetPlusFrameFeat):
    vis_net.<feat>.fc1/bn1.*                         -> vis_net/transform_<feat>
    vis_net.vis_attention_layer...                   -> vis_net/attention
    vis_net.frame_attention.<feat>.<i>...            -> vis_net/frame_attn_<feat>
                                                        (+ frame_fc when addFC)

Linear weights transpose (torch (out,in) -> flax (in,out)); GRU gate packing
(r,z,n) matches our layout verbatim; per-head gate rows stack into the
vectorized (H, d) kernels.
"""

from __future__ import annotations

import sys
from typing import Dict, Tuple

import numpy as np

from ..models.laff import _safe
from ..utils import get_logger

logger = get_logger(__name__)

_TXT_ENCODER_NAMES = {
    "rnn": "rnn_encoder",
    "bert": "bert_encoder",
    "bow": "bow_encoder",
    "w2v": "w2v_encoder",
    "clip": "CLIP_encoder",
    "netvlad": "NetVLAD_encoder",
}


def _alias_reference_modules():
    """Make reference pickled objects (configs.*, txt2vec, textlib, bigfile)
    resolvable against our packages when unpickling torch checkpoints."""
    import laff_tpu.configs as _configs
    import laff_tpu.store.bigfile as _bigfile
    import laff_tpu.text.textlib as _textlib
    import laff_tpu.text.txt2vec as _txt2vec

    # 'configs.<name>' submodules resolve through the aliased package path
    sys.modules.setdefault("configs", _configs)
    sys.modules.setdefault("textlib", _textlib)
    sys.modules.setdefault("txt2vec", _txt2vec)
    sys.modules.setdefault("bigfile", _bigfile)


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _convert_transform(sd: Dict, prefix: str, params: Dict, stats: Dict, key: str):
    """fc1 + bn1 of one TransformNet."""
    node: Dict = {}
    if prefix + "fc1.weight" in sd:
        node["fc1"] = {
            "kernel": _np(sd[prefix + "fc1.weight"]).T,
            "bias": _np(sd[prefix + "fc1.bias"]),
        }
    if prefix + "bn1.weight" in sd:
        node["bn1"] = {
            "scale": _np(sd[prefix + "bn1.weight"]),
            "bias": _np(sd[prefix + "bn1.bias"]),
        }
        stats[key] = {
            "bn1": {
                "mean": _np(sd[prefix + "bn1.running_mean"]),
                "var": _np(sd[prefix + "bn1.running_var"]),
            }
        }
    if node:
        params[key] = node


def _convert_multihead_gate(sd: Dict, prefix: str, heads: int):
    """attention_layer.<h>.embedding_common.0.{weight,bias} rows ->
    (H, d) kernel + (H,) bias; head-0 residual weight -> scalar."""
    kernels, biases = [], []
    for h in range(heads):
        w = _np(sd[f"{prefix}attention_layer.{h}.embedding_common.0.weight"])
        b = _np(sd[f"{prefix}attention_layer.{h}.embedding_common.0.bias"])
        kernels.append(w[0])
        biases.append(b[0])
    params = {
        "gate_kernel": np.stack(kernels),
        "gate_bias": np.asarray(biases, dtype=np.float32),
    }
    g_key = f"{prefix}attention_layer.0.global_emb_weight_net.weight"
    schedule = None
    if g_key in sd:
        schedule = np.asarray(_np(sd[g_key]).reshape(()), dtype=np.float32)
    return params, schedule


def _convert_single_gate(sd: Dict, prefix: str):
    """One Attention_1: embedding_common.0.{weight (1,d), bias (1,)}."""
    w = _np(sd[prefix + "embedding_common.0.weight"])
    b = _np(sd[prefix + "embedding_common.0.bias"])
    params = {"gate": {"kernel": w.T, "bias": b}}
    g_key = prefix + "global_emb_weight_net.weight"
    schedule = None
    if g_key in sd:
        schedule = np.asarray(_np(sd[g_key]).reshape(()), dtype=np.float32)
    return params, schedule


def convert_state_dict(sd: Dict, spec) -> Tuple[Dict, Dict, Dict]:
    """Reference state dict -> (params, batch_stats, schedule) pytrees
    matching LAFFModel(spec).init."""
    params: Dict = {"txt_net": {}, "vis_net": {}}
    stats: Dict = {"txt_net": {}, "vis_net": {}}
    schedule: Dict = {"txt_net": {}, "vis_net": {}}
    heads = spec.txt.attention.heads

    # ---- text tower -------------------------------------------------------
    for name, _dim in spec.txt.features:
        enc = _TXT_ENCODER_NAMES.get(name, name)
        _convert_transform(
            sd, f"txt_net.transform_layer.{enc}_transform.",
            params["txt_net"], stats["txt_net"], f"transform_{_safe(name)}",
        )
    if spec.txt.gru is not None and "txt_net.encoder.rnn_encoder.we.weight" in sd:
        gru = {"we": _np(sd["txt_net.encoder.rnn_encoder.we.weight"])}
        for layer in range(spec.txt.gru.rnn_layer):
            for tag in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                ref = f"txt_net.encoder.rnn_encoder.rnn.{tag}_l{layer}"
                ours = tag.replace("weight", "w").replace("bias", "b") + f"_l{layer}"
                if ref in sd:
                    gru[ours] = _np(sd[ref])
                if spec.txt.gru.bidirectional and ref + "_reverse" in sd:
                    gru[ours + "_rev"] = _np(sd[ref + "_reverse"])
        params["txt_net"]["gru"] = gru
    if "txt_net.expert_embedding.weight" in sd:
        params["txt_net"]["expert_embedding"] = _np(sd["txt_net.expert_embedding.weight"])
    if f"txt_net.attention_layer.attention_layer.0.embedding_common.0.weight" in sd:
        attn, g = _convert_multihead_gate(sd, "txt_net.attention_layer.", heads)
        params["txt_net"]["attention"] = attn
        if g is not None:
            schedule["txt_net"]["attention"] = {"global_emb_weight": g}

    # ---- visual tower -----------------------------------------------------
    frame_laff = any(k.startswith("vis_net.vis_attention_layer.") for k in sd)
    if frame_laff:
        vis_transform_prefix = "vis_net."
        vis_attn_prefix = "vis_net.vis_attention_layer."
    else:
        vis_transform_prefix = "vis_net.VisMutiTransformNet."
        vis_attn_prefix = "vis_net.attention_layer."

    vis_feats = list(spec.vis.features) + list(spec.vis.frame_features)
    for name, _dim in vis_feats:
        _convert_transform(
            sd, f"{vis_transform_prefix}{name}.",
            params["vis_net"], stats["vis_net"], f"transform_{_safe(name)}",
        )
    if "vis_net.expert_embedding.weight" in sd:
        params["vis_net"]["expert_embedding"] = _np(sd["vis_net.expert_embedding.weight"])
    if f"{vis_attn_prefix}attention_layer.0.embedding_common.0.weight" in sd:
        attn, g = _convert_multihead_gate(sd, vis_attn_prefix, heads)
        params["vis_net"]["attention"] = attn
        if g is not None:
            schedule["vis_net"]["attention"] = {"global_emb_weight": g}

    # frame-level attention (FrameLAFF): Sequential index 0 (no FC) or
    # FC at 0 + attention at 1 (vis_frame_addFC)
    for fname, _dim in spec.vis.frame_features:
        base = f"vis_net.frame_attention.{fname}."
        if spec.vis.frame_add_fc and base + "0.weight" in sd:
            params["vis_net"][f"frame_fc_{_safe(fname)}"] = {
                "kernel": _np(sd[base + "0.weight"]).T,
                "bias": _np(sd[base + "0.bias"]),
            }
            attn_idx = "1."
        else:
            attn_idx = "0."
        gate_key = base + attn_idx + "embedding_common.0.weight"
        if gate_key in sd:
            fa = spec.vis.frame_attention
            if fa is not None and fa.kind.startswith("Multi_head"):
                attn, g = _convert_multihead_gate(sd, base + attn_idx, fa.heads)
            else:
                attn, g = _convert_single_gate(sd, base + attn_idx)
            params["vis_net"][f"frame_attn_{_safe(fname)}"] = attn
            if g is not None:
                schedule["vis_net"][f"frame_attn_{_safe(fname)}"] = {
                    "global_emb_weight": g
                }

    # prune empty subtrees
    for tree in (params, stats, schedule):
        for side in ("txt_net", "vis_net"):
            if not tree[side]:
                del tree[side]
    return params, stats, schedule


def _vis_dims_from_state_dict(sd, config):
    """Recover per-feature visual dims from a reference state dict.

    Real released reference checkpoints need this: the trainer writes the
    dims dict with ``config.vis_fc_layers[0] = {...}`` (trainer.py:130),
    which mutates the shared *class* attribute in place — it never enters
    the pickled instance ``__dict__``, so unpickling in a fresh process
    yields the pristine ``['0', N]`` placeholder. The reference papers over
    this by re-running prepare_config before touching the checkpoint config
    (predictor.py); we instead read the dims off the weights:

    - transformed features: ``fc1.weight`` is (common, raw) -> raw = shape[1]
    - no_transform features: TransformNet(fc=False, batch_norm=True) over the
      input repeated ``heads`` times (model.py:1804-1805, 1822-1823), so
      ``bn1.running_mean`` has width raw*heads.
    """
    heads = 1
    mha = getattr(config, "multi_head_attention", None)
    if isinstance(mha, dict):
        heads = int(mha.get("heads", 1))
    no_transform = set(getattr(config, "vis_no_transform", ()) or ())
    dims = {}
    # same layout autodetect as convert_state_dict: FrameLAFF nests the
    # per-feature transforms directly under vis_net.<feat>.*
    if any(k.startswith("vis_net.vis_attention_layer.") for k in sd):
        prefix = "vis_net."
    else:
        prefix = "vis_net.VisMutiTransformNet."
    for key, w in sd.items():
        if not key.startswith(prefix):
            continue
        name, _, rest = key[len(prefix):].partition(".")
        if rest == "fc1.weight":
            dims[name] = int(w.shape[1])
        elif rest == "bn1.running_mean" and name not in dims:
            div = heads if name in no_transform else 1
            dims[name] = int(w.shape[0]) // max(div, 1)
    # a transformed feature has both keys; fc1 (unconditional above) wins
    return dims


def spec_from_reference_config(config, state_dict=None):
    """Rebuild a LAFFSpec from a reference pickled config object (dims were
    mutated into it before checkpointing, reference trainer.py:126-214).

    When the pickled config carries the un-mutated ``['0', N]`` class-attr
    placeholder instead of the dims dict (every checkpoint the reference
    itself produces — see _vis_dims_from_state_dict), the dims are
    recovered from ``state_dict`` weight shapes.
    """
    from .prepare import build_spec

    raw = config.vis_fc_layers[0]
    if isinstance(raw, dict):
        vis_all = dict(raw)
    elif state_dict is not None:
        vis_all = _vis_dims_from_state_dict(state_dict, config)
    else:
        raise ValueError(
            "config.vis_fc_layers[0] is the un-mutated placeholder "
            f"({raw!r}) and no state_dict was given to recover dims from"
        )
    frame_dims = {}
    if getattr(config, "frame_feat_input", False):
        for n in config.vid_frame_feats:
            if n in vis_all:
                frame_dims[n] = vis_all.pop(n)
    vis_all.pop("vis_feat_add_concat", None)

    from ..models.spec import GruSpec

    txt_dims = {}
    gru_spec = None
    te = config.text_encoding
    rnn_encoding, pooling = te["rnn_encoding"]["name"].split("_", 1)
    if rnn_encoding in ("gru", "bigru"):
        if getattr(config, "t2v_idx", None):
            vocab_size = len(config.t2v_idx.vocab)
        elif state_dict is not None and "txt_net.encoder.rnn_encoder.we.weight" in state_dict:
            vocab_size = int(state_dict["txt_net.encoder.rnn_encoder.we.weight"].shape[0])
        else:
            vocab_size = 0
        txt_dims["rnn"] = config.rnn_size * (2 if rnn_encoding == "bigru" else 1)
        gru_spec = GruSpec(
            vocab_size=vocab_size, we_dim=config.we_dim,
            rnn_size=config.rnn_size, rnn_layer=config.rnn_layer,
            pooling=pooling, bidirectional=(rnn_encoding == "bigru"),
        )
    if "no" not in te["bert_encoding"]["name"]:
        txt_dims["bert"] = config.bert_size
    if "no" not in te["bow_encoding"]["name"]:
        _bow_key = "txt_net.transform_layer.bow_encoder_transform.fc1.weight"
        if getattr(config, "t2v_bow", None) is not None:
            txt_dims["bow"] = config.t2v_bow.ndims
        elif state_dict is not None and _bow_key in state_dict:
            txt_dims["bow"] = int(state_dict[_bow_key].shape[1])
        else:
            raise ValueError("cannot determine bow dim: no t2v_bow in config "
                             "and no bow fc1 weight in state dict")
    if "no" not in te["CLIP_encoding"]["name"]:
        txt_dims["clip"] = config.clip_opt["size"]
    if "no" not in te["w2v_encoding"]["name"]:
        # t2v_w2v is None'd before checkpointing (trainer.py:403); read the
        # width off the transform weight, else infer it from the concat dim
        # the trainer wrote into the config (rebound -> survives pickling)
        _w2v_key = "txt_net.transform_layer.w2v_encoder_transform.fc1.weight"
        total = config.txt_fc_layers[0] if isinstance(
            config.txt_fc_layers, (list, tuple)) else 0
        known = sum(txt_dims.values())
        if state_dict is not None and _w2v_key in state_dict:
            txt_dims["w2v"] = int(state_dict[_w2v_key].shape[1])
        elif total > known:
            txt_dims["w2v"] = total - known
        else:
            txt_dims["w2v"] = 500

    return build_spec(config, vis_all, txt_dims, gru_spec, frame_dims)


def load_torch_checkpoint(path: str) -> Dict:
    """Load a reference ``.pth.tar`` and return a laff_tpu checkpoint
    payload (params/batch_stats/schedule/config/spec/...)."""
    import torch

    _alias_reference_modules()
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    config = ckpt["config"]
    if getattr(config, "txt_fc_same_with_vis_fc", False):
        logger.warning(
            "checkpoint config sets txt_fc_same_with_vis_fc=True: the "
            "reference's multi-head tie is a silent no-op (a throwaway "
            "dict(named_modules()) assignment), so this checkpoint was "
            "trained with UNTIED towers and imports as such. laff_tpu "
            "implements the documented tying intent for its own training, "
            "so a repo-trained tied model is NOT bit-compatible with this "
            "import (see MIGRATING.md)."
        )
    spec = spec_from_reference_config(config, state_dict=ckpt["model"])
    params, stats, schedule = convert_state_dict(ckpt["model"], spec)
    opt = ckpt.get("opt")
    opt_dict = vars(opt) if opt is not None and not isinstance(opt, dict) else (opt or {})
    logger.info(
        "imported reference checkpoint %s (epoch %s, best %s)",
        path, ckpt.get("epoch"), ckpt.get("best_perf"),
    )
    return {
        "epoch": ckpt.get("epoch"),
        "best_perf": ckpt.get("best_perf"),
        "params": params,
        "batch_stats": stats,
        "schedule": schedule,
        "config": config,
        "opt": opt_dict,
        "spec": spec,
    }
