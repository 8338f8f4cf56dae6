"""Experiment preparation: CLI options + config -> sources, featurizers,
model spec, feeds.

Functional parity with reference ``trainer.prepare_config``
(``trainer.py:53-294``): same collection/vocab/feature directory layout,
same config mutation points (feature dims written into
``config.vis_fc_layers[0]``), same model-path scheme. Differences:

* Vocabularies are auto-built from the train captions when the pickled
  vocab file is missing (the reference hard-fails).
* Text featurizers are handed to the data feed (host pipeline), never to
  the model.
* The output is an immutable LAFFSpec for the flax model builders.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..data import PairFeed, TextBatcher, TextSource, VisBatcher, VisionSource, read_video_set
from ..models.spec import (
    AttentionSpec, GruSpec, LAFFSpec, Task2Spec, Task3Spec, TowerSpec,
    TransformSpec,
)
from ..store import BigFile
from ..text import build_vocab, get_txt2vec
from ..text.txt2vec import IndexVec, load_vocab_pickle
from ..text.vocab import save_vocab
from ..utils import ROOT_PATH, get_logger, makedirs

logger = get_logger(__name__)

# reference encoder-module names (state-dict keys) -> our feature keys
_ENCODER_ALIASES = {
    "rnn_encoder": "rnn",
    "bert_encoder": "bert",
    "bow_encoder": "bow",
    "w2v_encoder": "w2v",
    "CLIP_encoder": "clip",
    "NetVLAD_encoder": "netvlad",
}


@dataclasses.dataclass
class Options:
    """CLI options (mirrors reference ``do_trainer.parse_args``)."""

    trainCollection: str = "msrvtt10ktrain"
    valCollection: str = "msrvtt10kval"
    rootpath: str = ROOT_PATH
    trainCollection2: str = "None"
    task2_caption: str = "no_task2_caption"
    task3_caption: str = "no_task3_caption"
    train_strategy: str = "usual"
    overwrite: int = 0
    val_set: str = "setA"
    metric: str = "mir"
    num_epochs: int = 80
    batch_size: int = 128
    workers: int = 2
    model_prefix: str = "runs_0"
    config_name: str = "laff"
    parm_adjust_config: str = "None"
    device: str = "0"
    random_seed: int = 2
    local_rank: int = 0
    pretrained_file_path: str = "None"
    save_mean_last: int = 0
    # TPU-native extension: K train steps per device dispatch (lax.scan);
    # amortizes per-dispatch host latency. -1 = auto (scan once epochs are
    # device-resident), 1 = reference-style stepping.
    steps_per_dispatch: int = -1
    # TPU-native extension: keep all train video features resident in HBM
    # and send only int32 row indices per batch (engine/feature_cache.py).
    # -1 = auto (on when bit-identical to the fed path and under the
    # LAFF_TPU_CACHE_BUDGET HBM budget), 0 = off, 1 = force on.
    device_feature_cache: int = -1
    # TPU-native extension: same for the caption-side encodings — with both
    # caches a train step's host traffic is two (B,) int32 index vectors.
    device_text_cache: int = -1
    # TPU-native extension: ship bow vectors as sparse (ids, counts) pairs
    # and densify on device (FusionTower scatter).
    device_text_featurize: int = 0
    # TPU-native extension: stage the (epoch-invariant) validation feature
    # batches in HBM on the first validation pass and replay them every
    # later epoch — bit-identical metrics, zero repeat host traffic.
    # Budget-guarded (LAFF_TPU_EVAL_STAGE_BUDGET bytes); 0 = off.
    stage_val_features: int = 1
    # TPU-native extension: FULL resume (optimizer + LR controller +
    # counters) from <model_dir>/model_resume.pth.tar; bit-identical to an
    # uninterrupted run (the reference can only warm-start weights).
    resume: int = 0
    # TPU-native extension: data-parallel training over an N-device mesh
    # (batches shard over 'dp'; GSPMD inserts the gradient collectives).
    data_parallel: int = 0
    # OPT-IN implementation of the task2 (concept space) INTENT. The
    # reference's task2 loss is dead code (model/model.py:884 passes
    # literal zeros — decision record in COMPONENTS.md), so the default 0
    # keeps effective parity: --task2_caption is accepted but inert.
    # 1 = project both towers into the object-caption bow concept space
    # and add the BCE + concept-triplet auxiliary loss (Task2Spec).
    task2_intended: int = 0
    # Epochs without val improvement before stopping (reference
    # trainer.py:426-433 hardcodes 10). Raise for fixed-epoch-count
    # measurement runs (e.g. the 80-epoch wall-clock headline).
    early_stop_patience: int = 10


def load_config(config_name: str):
    """Import ``laff_tpu.configs.<name>`` (or a root-level ``configs.<name>``
    for user-supplied experiment files) and instantiate its config class."""
    import importlib

    for module_path in (f"laff_tpu.configs.{config_name}", f"configs.{config_name}"):
        try:
            module = importlib.import_module(module_path)
            return module.config()
        except ModuleNotFoundError as e:
            last = e
    raise last


def model_dir_for(opt) -> str:
    """<root>/<train>/w2vvpp_train/<val>/<val_set>/<config>/<prefix>
    (reference ``trainer.py:88-92``)."""
    val_set = "" if opt.val_set == "no" else opt.val_set
    train = opt.trainCollection
    if getattr(opt, "trainCollection2", "None") != "None":
        train = train + "_" + opt.trainCollection2
    return os.path.join(
        opt.rootpath, train, "w2vvpp_train", opt.valCollection, val_set,
        opt.config_name, opt.model_prefix,
    )


def w2v_dir_for(rootpath: str, config) -> str:
    """The word2vec dump directory: the reference's fixed
    vec500flickr30m layout, with a config override fallback."""
    w2v_dir = os.path.join(rootpath, "word2vec", "flickr", "vec500flickr30m")
    if not os.path.exists(w2v_dir):
        alt = getattr(config, "w2v_dir", None)
        if alt and os.path.exists(os.path.join(rootpath, alt)):
            w2v_dir = os.path.join(rootpath, alt)
    return w2v_dir


def get_we(vocab, w2v_dir: str) -> np.ndarray:
    """Word-embedding init matrix: uniform(-1,1) overwritten with w2v rows
    where available (reference ``model/model.py:30-48``)."""
    w2v = BigFile(w2v_dir)
    nr_words = len(vocab)
    words = [vocab[i] for i in range(nr_words)]
    we = np.random.uniform(low=-1.0, high=1.0, size=(nr_words, w2v.ndims))
    renamed, vecs = w2v.gather(words)
    for name, vec in zip(renamed, vecs):
        we[vocab.find(name)] = vec
    return we.astype(np.float32)


def _vocab_path(rootpath, collection, encoding, threshold, dirname="vocab"):
    return os.path.join(
        rootpath, collection, "TextData", dirname, f"{encoding}_{threshold}.pkl"
    )


def _ensure_vocab(rootpath, collection, encoding, threshold, capfile,
                  dirname="vocab"):
    path = _vocab_path(rootpath, collection, encoding, threshold, dirname)
    if os.path.exists(path):
        return load_vocab_pickle(path)
    logger.info("vocab %s missing; building from %s", path, capfile)
    vocab, _ = build_vocab(capfile, encoding, threshold=threshold)
    save_vocab(vocab, path)
    return vocab


def _attn_spec(config, kind: str) -> AttentionSpec:
    aph = config.attention_param_each_head
    mha = config.multi_head_attention
    return AttentionSpec(
        kind=kind,
        heads=mha["heads"],
        with_ave=aph["with_ave"],
        mul=aph["mul"],
        split_head=aph["split_head"],
        l2norm_each_head=config.attention_l2norm,
        dropout=mha["dropout"],
        output_type=config.my_self_attention_output_type,
        agg=config.muti_head_attention_official["agg"],
        embed_dim_qkv=mha["embed_dim_qkv"],
    )


def _no_transform_keys(names) -> Tuple[str, ...]:
    return tuple(_ENCODER_ALIASES.get(n, n) for n in names)


def _tied_transforms(config, txt_dims, vis_dims):
    """Decode ``txt_fc_same_with_vis_fc`` / ``_dict`` (reference
    configs/base_config.py:268-271) into (txt feature, vis feature) tie
    pairs. Dict keys are reference encoder names ('CLIP_encoder',
    'bert_encoding', ...); values are vis feature names. An empty dict on
    the concat/concat architecture ties the whole transform (reference
    W2VVPP, model/model.py:764-768)."""
    if not getattr(config, "txt_fc_same_with_vis_fc", False):
        return ()
    tie_dict = getattr(config, "txt_fc_same_with_vis_fc_dict", {}) or {}
    if not tie_dict:
        if (config.txt_attention == "concat"
                and config.vis_attention == "concat"):
            return (("__concat__", "__concat__"),)
        raise ValueError(
            "txt_fc_same_with_vis_fc=True needs txt_fc_same_with_vis_fc_dict "
            "entries (or concat fusion on both towers)"
        )
    pairs = []
    for enc_key, vis_name in tie_dict.items():
        txt_name = enc_key.split("_")[0].lower()
        if txt_name in ("gru", "bigru"):
            txt_name = "rnn"
        if txt_name not in txt_dims or vis_name not in vis_dims:
            raise ValueError(
                f"txt_fc_same_with_vis_fc is not matching encoder_name_list: "
                f"({enc_key} -> {txt_name!r}, {vis_name!r}); active txt "
                f"features {sorted(txt_dims)}, vis features {sorted(vis_dims)}"
            )
        pairs.append((txt_name, vis_name))
    return tuple(pairs)


def build_spec(
    config,
    vis_dims: Dict[str, int],
    txt_dims: Dict[str, int],
    gru_spec: Optional[GruSpec],
    frame_dims: Optional[Dict[str, int]] = None,
    task3: bool = False,
    task2: Optional["Task2Spec"] = None,
) -> LAFFSpec:
    """config + discovered feature dims -> frozen LAFFSpec."""
    if isinstance(config.txt_fc_layers, str):
        txt_common = int(config.txt_fc_layers.split("-")[1])
    else:
        txt_common = int(config.txt_fc_layers[1])
    vis_common = int(config.vis_fc_layers[1])

    # per-encoder transform overrides (bert/clip options; no_transform)
    overrides: List[Tuple[str, TransformSpec]] = []
    txt_nt = _no_transform_keys(config.txt_no_transform)
    if "bert" in txt_dims:
        overrides.append((
            "bert",
            TransformSpec(
                dim_in=txt_dims["bert"], dim_out=txt_common, fc=True,
                activation=config.bert_transform_activation,
                dropout=config.bert_transform_dropout,
                batch_norm=config.bert_transform_batch_norm,
            ),
        ))
    if "clip" in txt_dims:
        co = config.clip_opt
        if "clip" in txt_nt:
            overrides.append((
                "clip",
                TransformSpec(
                    dim_in=txt_dims["clip"], dim_out=txt_common, fc=False,
                    activation=None, dropout=co["transform_dropout"],
                    batch_norm=co["transform_batch_norm"],
                ),
            ))
        else:
            overrides.append((
                "clip",
                TransformSpec(
                    dim_in=txt_dims["clip"], dim_out=txt_common, fc=True,
                    activation=co["transform_activation"],
                    dropout=co["transform_dropout"],
                    batch_norm=co["transform_batch_norm"],
                ),
            ))

    compute_dtype = "bfloat16" if getattr(config, "float16", False) else "float32"
    bert_spec = None
    if "bert" in txt_dims and not getattr(config, "bert_frozen", True):
        from ..models.spec import BertSpec

        kwargs = dict(getattr(config, "bert_config_kwargs", {}) or {})
        bert_spec = BertSpec(
            name_or_path=config.text_encoding["bert_encoding"]["name"],
            hidden_size=config.bert_size,
            max_length=getattr(config, "bert_max_length", 64),
            do_lower_case=config.bert_do_lower_case,
            config_kwargs=tuple(sorted(kwargs.items())),
        )
    txt = TowerSpec(
        features=tuple(txt_dims.items()),
        common_dim=txt_common,
        attention=_attn_spec(config, config.txt_attention),
        no_transform=txt_nt,
        transform_overrides=tuple(overrides),
        expert_embedding=config.txt_expert_embedding["expert"],
        expert_l2norm=config.txt_expert_embedding["l2norm"],
        dropout=config.dropout,
        batch_norm=config.batch_norm,
        activation=config.activation,
        gru=gru_spec,
        bert=bert_spec,
        compute_dtype=compute_dtype,
    )

    vis_nt = _no_transform_keys(config.vis_no_transform)
    frame_dims = frame_dims or {}
    vis = TowerSpec(
        features=tuple(vis_dims.items()),
        common_dim=vis_common,
        attention=_attn_spec(config, config.vis_attention),
        no_transform=vis_nt,
        expert_embedding=config.vis_expert_embedding["expert"],
        expert_l2norm=config.vis_expert_embedding["l2norm"],
        dropout=config.dropout,
        batch_norm=config.batch_norm,
        activation=config.activation,
        frame_features=tuple(frame_dims.items()),
        frame_attention=(
            _attn_spec(config, config.vis_frame_attention) if frame_dims else None
        ),
        frame_add_fc=config.vis_frame_addFC,
        frame_feat_with_video_feat=config.frame_feat_with_video_feat,
        feat_add_concat=config.vis_feat_add_concat,
        compute_dtype=compute_dtype,
    )

    task3_spec = None
    if task3:
        task3_spec = Task3Spec(
            neg_weight=config.task3_neg_weight,
            bottom_margin=config.task3_bottommargin,
            upper_margin=config.task3_uppermargin,
            bottom_margin_t2t=config.task3_bottommargin_t2t,
            upper_margin_t2t=config.task3_uppermargin_t2t,
            retrieval_weight=config.task3_neg_retrival_weight,
            end_epoch=config.task3_end,
        )
    return LAFFSpec(
        txt=txt,
        vis=vis,
        tied_transforms=_tied_transforms(config, txt_dims, vis_dims),
        multi_space=config.multi_space,
        measure=config.measure,
        margin=config.margin,
        direction=config.direction,
        max_violation=config.max_violation,
        cost_style=config.cost_style,
        loss=config.loss,
        task3=task3_spec,
        task2=task2,
    )


@dataclasses.dataclass
class Prepared:
    opt: Options
    config: object
    spec: LAFFSpec
    model_path: str
    train_feed: PairFeed
    val_txt_source: TextSource
    val_txt_batcher: TextBatcher
    val_vis_batcher: VisBatcher
    val_vis_ids: List[str]
    featurizers: Dict
    gru_vocab: Optional[object]
    we: Optional[np.ndarray]
    train2_feed: Optional[PairFeed] = None
    # device w2v mean-pool table (K+1, D) when device_text_featurize covers
    # the w2v encoder; the train step closes over it in HBM
    w2v_table: Optional[np.ndarray] = None
    # task3: <val TextData>/<val_set>/<val>.caption.negationset.txt — the
    # validation-caption subset re-evaluated per epoch as 'task3' metrics
    # (reference trainer.py:120-122, 596-607)
    negationset_path: Optional[str] = None


def _collection_paths(rootpath, collection, val_set=""):
    cdir = os.path.join(rootpath, collection)
    capfile = os.path.join(cdir, "TextData", val_set, f"{collection}.caption.txt")
    return cdir, capfile


def _open_vis_files(rootpath, collection, feat_names) -> Dict[str, BigFile]:
    return {
        name: BigFile(os.path.join(rootpath, collection, "FeatureData", name))
        for name in feat_names
    }


def _open_frame_files(rootpath, collection, names) -> Dict[str, BigFile]:
    return {
        name: BigFile(os.path.join(rootpath, collection, "FeatureData", "frame", name))
        for name in names
    }


def _text_precomputed(config, capfile) -> Dict[str, BigFile]:
    """Precomputed text-feature BigFiles next to the caption file
    (reference ``data_provider.py:565-574``)."""
    out = {}
    tdir = os.path.dirname(capfile)
    for enc_name, enc in config.text_encoding.items():
        if enc["name"].startswith(("no", "No")):
            continue
        if enc_name in ("CLIP_encoding", "bert_encoding") and "dir_name" in enc:
            path = os.path.join(tdir, enc["dir_name"])
            if os.path.exists(path):
                out[enc_name] = BigFile(path)
    return out


def build_featurizers(config, rootpath, vocab_collection, train_capfile):
    """Text featurizer bank for the feed + the txt-tower feature dims."""
    txt_dims: Dict[str, int] = {}
    featurizers: Dict[str, object] = {}
    gru_spec = None
    gru_vocab = None
    we = None

    te = config.text_encoding
    rnn_encoding, pooling = te["rnn_encoding"]["name"].split("_", 1)

    w2v_dir = w2v_dir_for(rootpath, config)

    # order matters: rnn, bert, bow, w2v, clip, netvlad (reference
    # model/model.py:558-620 insertion order)
    if rnn_encoding in ("gru", "bigru"):
        gru_vocab = _ensure_vocab(
            rootpath, vocab_collection, "gru", config.threshold, train_capfile
        )
        featurizers["rnn"] = IndexVec(gru_vocab)
        rnn_out = config.rnn_size * (2 if rnn_encoding == "bigru" else 1)
        txt_dims["rnn"] = rnn_out
        # w2v-initialize the embedding table ONLY when we_dim == 500, the
        # released w2v dump's width — the reference's exact gate
        # (model/model.py:334-336); any other width keeps the N(0,1)
        # nn.Embedding default. Generalizing the gate to "dims line up"
        # measurably HURT from-scratch training on the 8-dim rehearsal
        # world (~-0.05 mean best mir over 20+ seeds vs the reference,
        # round-4 equivalence sweep), so parity wins; opt back in on
        # non-500 widths with config.w2v_init_rnn = True.
        w2v_init = getattr(config, "w2v_init_rnn", None)
        if w2v_init is None:
            w2v_init = config.we_dim == 500
        if (w2v_init and os.path.exists(w2v_dir)
                and BigFile(w2v_dir).ndims == config.we_dim):
            we = get_we(gru_vocab, w2v_dir)
            we_dim = we.shape[1]
        else:
            we_dim = config.we_dim
        gru_spec = GruSpec(
            vocab_size=len(gru_vocab),
            we_dim=we_dim,
            rnn_size=config.rnn_size,
            rnn_layer=config.rnn_layer,
            pooling=pooling,
            bidirectional=(rnn_encoding == "bigru"),
        )

    if "no" not in te["bert_encoding"]["name"]:
        txt_dims["bert"] = config.bert_size
        bert_name = te["bert_encoding"]["name"]
        if not getattr(config, "bert_frozen", True):
            # in-graph fine-tuning tower: the feed ships token ids
            from ..models.bert import BertTokensFeaturizer

            featurizers["bert"] = BertTokensFeaturizer(
                bert_name,
                do_lower_case=config.bert_do_lower_case,
                max_length=getattr(config, "bert_max_length", 64),
                vocab_file=getattr(config, "bert_vocab_file", ""),
            )
        elif os.path.isdir(os.path.expanduser(bert_name)):
            # frozen + local weights, no precomputed dump -> live featurizer
            from ..models.bert import LiveBertTextFeaturizer

            featurizers["bert"] = LiveBertTextFeaturizer(
                os.path.expanduser(bert_name),
                do_lower_case=config.bert_do_lower_case,
            )
        else:
            featurizers["bert"] = None  # precomputed via TextSource

    bow_encoding = te["bow_encoding"]["name"]
    if "no" not in bow_encoding:
        bow_vocab = _ensure_vocab(
            rootpath, vocab_collection, bow_encoding, config.threshold, train_capfile
        )
        bow = get_txt2vec(bow_encoding)(bow_vocab, norm=config.bow_norm)
        featurizers["bow"] = bow
        txt_dims["bow"] = bow.ndims

    w2v_encoding = te["w2v_encoding"]["name"]
    if "no" not in w2v_encoding:
        w2v = get_txt2vec(w2v_encoding)(w2v_dir)
        featurizers["w2v"] = w2v
        txt_dims["w2v"] = w2v.ndims

    if "no" not in te["CLIP_encoding"]["name"]:
        txt_dims["clip"] = config.clip_opt["size"]
        featurizers["clip"] = None  # precomputed via TextSource

    if "no" not in te["NetVLAD_encoding"]["name"]:
        w2v = get_txt2vec("w2v_nsw")(w2v_dir)
        featurizers["netvlad"] = w2v
        txt_dims["netvlad"] = w2v.ndims * config.NetVLAD_opt["num_clusters"]

    return featurizers, txt_dims, gru_spec, gru_vocab, we


def _make_text_batcher(config, featurizers, source,
                       indexed_bow: bool = False,
                       indexed_w2v: bool = False) -> TextBatcher:
    active = {
        k: v for k, v in featurizers.items() if v is not None or k in ("clip", "bert")
    }
    return TextBatcher(source, active, max_txtlength=config.max_txtlength,
                       indexed_bow=indexed_bow, indexed_w2v=indexed_w2v)


def _prepare_task2(opt, config, rootpath, txt_dims, vis_dims):
    """task2 (concept space) preparation. Default: effective parity with
    the reference — the surface is accepted but builds nothing, because
    the reference's task2 loss is dead code (``model/model.py:884``; see
    COMPONENTS.md decision record). With ``--task2_intended 1``: build the
    object-caption bow vocabulary (reference layout
    ``TextData/vocab_<suffix>/<enc>_<threshold>.pkl``, trainer.py:231-233)
    and per-video multi-hot concept labels, returning (Task2Spec,
    labels dict)."""
    suffix = getattr(opt, "task2_caption", "no_task2_caption")
    if suffix == "no_task2_caption":
        return None, None
    if not int(getattr(opt, "task2_intended", 0)):
        logger.warning(
            "task2_caption=%s accepted but INERT: the reference's task2 "
            "loss is dead code (model/model.py:884 passes zeros) and "
            "parity is kept by default. Pass --task2_intended 1 for the "
            "intent implementation (concept-space auxiliary loss).",
            suffix,
        )
        return None, None
    capfile = os.path.join(
        rootpath, opt.trainCollection, "TextData",
        f"{opt.trainCollection}.caption.{suffix}.txt",
    )
    encoding = config.text_encoding_task2
    vocab2 = _ensure_vocab(
        rootpath, opt.trainCollection, encoding, config.threshold_task2,
        capfile, dirname=f"vocab_{suffix}",
    )
    bow2 = get_txt2vec(encoding)(vocab2, norm=0)
    labels = {
        vis_id: (np.asarray(bow2.encoding(cap)) > 0).astype(np.float32)
        for vis_id, cap in TextSource(capfile).captions.items()
    }
    if not labels:
        raise ValueError(f"task2 caption file {capfile} yielded no labels")

    feat2 = config.txt_feature_task2
    if feat2 in ("bow", "w2v"):
        if feat2 not in txt_dims:
            raise ValueError(
                f"txt_feature_task2={feat2!r} but the main text encoding "
                f"has no {feat2!r} feature (active: {sorted(txt_dims)})"
            )
        txt_dim_in = txt_dims[feat2]
    elif feat2 == "no":
        txt_dim_in = 0
    else:
        raise NotImplementedError(
            f"txt_feature_task2={feat2!r}: only bow/w2v/no are supported "
            "(the gru variant would need the in-graph GRU encoding)"
        )
    if not vis_dims:
        raise ValueError("task2 needs video-level features (vid_feats)")
    spec2 = Task2Spec(
        n_concepts=bow2.ndims,
        vis_dim_in=int(np.sum(list(vis_dims.values()))),
        txt_feature=feat2,
        txt_dim_in=txt_dim_in,
        activation=config.activation_task2,
        batch_norm=config.batch_norm_task2,
        dropout=config.dropout_task2,
        measure=config.measure_task2,
        alpha=config.alpha,
    )
    logger.info(
        "task2 (intent) enabled: %d concepts over %d labeled videos, "
        "alpha=%.3f", bow2.ndims, len(labels), config.alpha,
    )
    return spec2, labels


def prepare(opt: Options) -> Prepared:
    np.random.seed(opt.random_seed)
    opt.rootpath = os.path.expanduser(opt.rootpath)
    rootpath = opt.rootpath
    val_set = "" if opt.val_set == "no" else opt.val_set

    config = load_config(opt.config_name)
    if opt.parm_adjust_config != "None":
        config.adjust_parm(opt.parm_adjust_config)

    model_path = model_dir_for(opt)
    makedirs(model_path)

    _, train_capfile = _collection_paths(rootpath, opt.trainCollection)
    _, val_capfile = _collection_paths(rootpath, opt.valCollection, val_set)

    # visual features + dims -> config (reference trainer.py:126-157).
    # REBIND (not mutate in place): the reference writes into the shared
    # class-attribute list, so the dims never reach the pickled instance
    # __dict__ and unpickling in a fresh process sees the '0' placeholder —
    # the reference papers over this by re-running prepare_config before
    # reading the checkpoint config (predictor.py:432).
    # train_strategy='subset' (reference main_subset, trainer.py:456-482):
    # no separate val collection — the train pairs split 98.5/1.5 and the
    # holdout validates (the GCC-pretrain / --only_train recipe)
    subset = getattr(opt, "train_strategy", "usual") == "subset"
    train_vis = _open_vis_files(rootpath, opt.trainCollection, config.vid_feats)
    val_vis = (train_vis if subset
               else _open_vis_files(rootpath, opt.valCollection, config.vid_feats))
    config.vis_fc_layers = [
        {n: f.ndims for n, f in train_vis.items()},
        int(config.vis_fc_layers[1]),
    ]
    vis_dims = dict(config.vis_fc_layers[0])
    if config.vis_feat_add_concat:
        config.vis_fc_layers[0]["vis_feat_add_concat"] = int(
            np.sum(list(vis_dims.values()))
        )

    frame_dims = {}
    train_frames = val_frames = None
    if config.frame_feat_input:
        train_frames = _open_frame_files(rootpath, opt.trainCollection, config.vid_frame_feats)
        val_frames = (train_frames if subset else
                      _open_frame_files(rootpath, opt.valCollection, config.vid_frame_feats))
        frame_dims = {n: f.ndims for n, f in train_frames.items()}
        config.vis_fc_layers[0].update(frame_dims)

    vocab_collection = opt.trainCollection
    if getattr(opt, "trainCollection2", "None") != "None":
        vocab_collection = opt.trainCollection + "_" + opt.trainCollection2

    featurizers, txt_dims, gru_spec, gru_vocab, we = build_featurizers(
        config, rootpath, vocab_collection, train_capfile
    )
    if isinstance(config.txt_fc_layers, str):
        config.txt_fc_layers = [0, int(config.txt_fc_layers.split("-")[1])]
    config.txt_fc_layers[0] = int(np.sum(list(txt_dims.values())))

    task3_enabled = getattr(opt, "task3_caption", "no_task3_caption") != "no_task3_caption"
    task2_spec, task2_labels = _prepare_task2(opt, config, rootpath, txt_dims,
                                              vis_dims)
    spec = build_spec(config, vis_dims, txt_dims, gru_spec, frame_dims,
                      task3=task3_enabled, task2=task2_spec)

    # pickle the featurizer objects into the config, as the reference does
    # (trainer.py:182-214): checkpoints become self-describing, so both our
    # loader and torch-export round trips can rebuild vocabularies without
    # the original collection on disk (t2v_w2v stays None'd like the
    # reference, trainer.py:403)
    config.t2v_bow = featurizers.get("bow")
    config.t2v_idx = featurizers.get("rnn")
    config.t2v_w2v = None

    # feeds
    train_ids = read_video_set(
        os.path.join(rootpath, opt.trainCollection, "VideoSets", opt.trainCollection + ".txt")
    )
    train_tsource = TextSource(
        train_capfile, precomputed=_text_precomputed(config, train_capfile)
    )
    train_vsource = VisionSource(
        train_vis, train_ids, frame_feat_files=train_frames, max_frame=config.max_frame
    )
    task3_source = None
    if task3_enabled:
        capfile_task3 = os.path.join(
            rootpath, opt.trainCollection, "TextData",
            f"{opt.trainCollection}.caption.{opt.task3_caption}.txt",
        )
        task3_source = TextSource(
            capfile_task3, task3=True, shuffle_seed=opt.random_seed
        )
        if "clip" in featurizers or "bert" in featurizers:
            logger.warning(
                "task3 with precomputed clip/bert text features: false "
                "captions reuse the true caption's precomputed vector "
                "(live tower pending)"
            )
    # device-side text featurization: bow ships sparse (FusionTower
    # scatter); w2v ships row ids into a device-resident table the train
    # step mean-pools (the last fat per-step text transfer). The table's
    # restricted vocab must cover every caption the TRAIN feed can emit:
    # train + train2 + task3 false captions + negation-augmented variants.
    dtf = bool(getattr(opt, "device_text_featurize", 0))
    w2v_table = None
    dtf_w2v = False
    if dtf and featurizers.get("w2v") is not None:
        caps = list(train_tsource.captions.values())
        if task3_source is not None:
            caps += [c for lst in task3_source.captions_multi.values() for c in lst]
            caps += [c for lst in task3_source.negation_augmented().values()
                     for c in lst]
        if getattr(opt, "trainCollection2", "None") != "None":
            _, t2cap = _collection_paths(rootpath, opt.trainCollection2)
            caps += list(TextSource(t2cap).captions.values())
        w2v_table = featurizers["w2v"].build_row_index(caps)
        dtf_w2v = True
    train_cap_subset = None
    if subset:
        # sequential 98.5/1.5 split of the caption pairs (reference
        # trainer.py:477: train_val_split = int(0.985 * length))
        all_caps = list(train_tsource.cap_ids)
        cut = int(0.985 * len(all_caps))
        train_cap_subset = all_caps[:cut]
        holdout_caps = all_caps[cut:]
    train_feed = PairFeed(
        _make_text_batcher(config, featurizers, train_tsource,
                           indexed_bow=dtf, indexed_w2v=dtf_w2v),
        VisBatcher(train_vsource, with_frames=config.frame_feat_input,
                   task2_labels=task2_labels),
        batch_size=opt.batch_size,
        seed=opt.random_seed,
        task3_source=task3_source,
        cap_ids=train_cap_subset,
    )

    if subset:
        import copy

        val_tsource = copy.copy(train_tsource)
        val_tsource.cap_ids = holdout_caps
        val_tsource.length = len(holdout_caps)
        seen = dict.fromkeys(c.split("#")[0] for c in holdout_caps)
        val_ids = list(seen)
        val_vsource = train_vsource
    else:
        val_ids = read_video_set(
            os.path.join(rootpath, opt.valCollection, "VideoSets", opt.valCollection + ".txt")
        )
        val_tsource = TextSource(
            val_capfile, precomputed=_text_precomputed(config, val_capfile)
        )
        val_vsource = VisionSource(
            val_vis, val_ids, frame_feat_files=val_frames, max_frame=config.max_frame
        )

    train2_feed = None
    if getattr(opt, "trainCollection2", "None") != "None":
        t2_vis = _open_vis_files(rootpath, opt.trainCollection2, config.vid_feats)
        t2_frames = (
            _open_frame_files(rootpath, opt.trainCollection2, config.vid_frame_feats)
            if config.frame_feat_input else None
        )
        _, t2_capfile = _collection_paths(rootpath, opt.trainCollection2)
        t2_ids = read_video_set(
            os.path.join(rootpath, opt.trainCollection2, "VideoSets",
                         opt.trainCollection2 + ".txt")
        )
        t2_tsource = TextSource(
            t2_capfile, precomputed=_text_precomputed(config, t2_capfile)
        )
        t2_vsource = VisionSource(
            t2_vis, t2_ids, frame_feat_files=t2_frames, max_frame=config.max_frame
        )
        train2_feed = PairFeed(
            _make_text_batcher(config, featurizers, t2_tsource,
                               indexed_bow=dtf, indexed_w2v=dtf_w2v),
            VisBatcher(t2_vsource, with_frames=config.frame_feat_input),
            batch_size=opt.batch_size,
            seed=opt.random_seed + 1,
        )

    return Prepared(
        opt=opt,
        config=config,
        spec=spec,
        model_path=model_path,
        train_feed=train_feed,
        val_txt_source=val_tsource,
        val_txt_batcher=_make_text_batcher(
            config, featurizers, val_tsource,
            indexed_bow=bool(getattr(opt, 'device_text_featurize', 0))),
        val_vis_batcher=VisBatcher(val_vsource, with_frames=config.frame_feat_input),
        val_vis_ids=val_ids,
        featurizers=featurizers,
        gru_vocab=gru_vocab,
        we=we,
        train2_feed=train2_feed,
        w2v_table=w2v_table,
        negationset_path=(
            os.path.join(rootpath, opt.valCollection, "TextData", val_set,
                         f"{opt.valCollection}.caption.negationset.txt")
            if task3_enabled else None
        ),
    )
