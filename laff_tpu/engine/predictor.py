"""Prediction / evaluation driver (reference ``predictor.py:23-452``).

Loads a checkpoint (laff_tpu native or reference PyTorch via the torch
importer), rebuilds the model from the pickled spec/config, embeds the test
collection once, and per query set produces:

* benchmark collections: t2v + v2t metric rows appended to the
  result_log TSVs (identical column format) and a top-2000 ``t2v.pkl``
  rank dump;
* AVS collections (iacc.3 / v3c1): the full ``id.sent.score.txt`` ranking
  consumed by the TRECVID harness (laff_tpu.eval.trecvid).

Rankings use on-device ``lax.top_k`` over the blockwise similarity matrix
instead of a host argsort of the full T x V matrix.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import EvalFeed
from ..eval.metrics import metrics_from_ranks
from ..models import LAFFModel
from ..utils import ROOT_PATH, check_to_skip, get_logger, makedirs

from .checkpoint import load_checkpoint
from .evaluator import (
    LARGE_GALLERY,
    Embedder,
    score_matrix,
    score_matrix_streaming,
    t2v_ranks,
)

logger = get_logger(__name__)

AVS_COLLECTIONS = ("iacc.3", "v3c1")


@dataclasses.dataclass
class PredictOptions:
    testCollection: str
    model_path: str
    sim_name: str
    rootpath: str = ROOT_PATH
    overwrite: int = 0
    query_sets: str = "tv16.avs.txt"
    predict_result_file: str = "result_log/result_test.txt"
    batch_size: int = 1024
    num_workers: int = 0
    device: str = "0"
    adjust_weight_predict: int = 0  # parity: dead flag in the reference too
    task3_caption: str = "no_task3_caption"  # != default: boolean negation scoring
    neg_method: str = "sub"     # negation adjustment: sub | mul
    data_parallel: int = 0      # shard eval batches over an N-device mesh
    int8_gallery: int = 0       # large AVS galleries: int8 HBM nomination
                                # + exact candidate re-embedding (2x shots
                                # per chip vs streaming host scores)
    each_head: int = 0          # also dump per-space (per-head) metrics
    rerank: str = "none"        # none | kreciprocal | tkb | concept
    # concept re-ranking inputs (reference predict_concept_rerank,
    # model/model.py:1352-1406 + ReRank.py:161-371)
    concept_pkl: str = ""       # video<->concept CLIP sim pkl
    concept_weight: float = 2.0
    concept_topk: int = 1000
    concept_bow_counts: str = ""  # vocab count file ('word count' lines)
    concept_caption: str = ""     # caption file for substring-count fallback


def _topk_rankings(scores: np.ndarray, k: int):
    """Per-row descending top-k (indices, values) on device. Plain
    lax.top_k is the fastest exact path even at the AVS design point
    (measured 0.22 s for 128 queries x 1M shots x k=1000 — the
    approx_max_k sweep in eval.topk_wide is ~3.5x slower there)."""
    k = min(k, scores.shape[1])
    vals, idx = jax.lax.top_k(jnp.asarray(scores), k)
    return np.asarray(idx), np.asarray(vals)


def write_rank_dump(
    path: Optional[str],
    scores: Optional[np.ndarray],
    txt_ids: List[str],
    vis_ids: List[str],
    pkl_path: Optional[str] = None,
    captions: Optional[Dict[str, str]] = None,
    threshold: int = 2000,
    topk_rankings=None,
):
    """Reference ``txt2video_write_to_file`` (``predictor.py:53-88``):
    per-query ranked '<vis_id> <score>' lines (top-K when the gallery is
    large) and/or a pickled {txt_id: {query, rank_list, sim_value}} dict.

    ``topk_rankings=(idx, vals)`` supplies precomputed per-row descending
    rankings (the streaming large-gallery path merges them on the fly);
    otherwise they are ranked here from the full score matrix."""
    if topk_rankings is not None:
        idx, vals = topk_rankings
    else:
        topk = threshold if len(vis_ids) >= threshold else len(vis_ids)
        idx, vals = _topk_rankings(scores, topk)
    vis_arr = np.asarray(vis_ids)

    if path is not None:
        with open(path, "w") as fout:
            for q in range(idx.shape[0]):
                ranked = " ".join(
                    f"{vis_arr[i]} {v}" for i, v in zip(idx[q], vals[q])
                )
                fout.write(f"{txt_ids[q]} {ranked}\n")

    if pkl_path is not None:
        shot_dict = {}
        for q, tid in enumerate(txt_ids):
            shot_dict[tid] = {
                "query": captions.get(tid, "") if captions else "",
                "rank_list": [str(vis_arr[i]) for i in idx[q]],
                "sim_value": [float(v) for v in vals[q]],
            }
        with open(pkl_path, "wb") as fh:
            pickle.dump(shot_dict, fh)


def append_result_row(path: str, model_tag: str, parm_adjust: str, result_tuple):
    """Reference TSV row format (``predictor.py:91-126``)."""
    makedirs(os.path.dirname(path) or ".")
    r1, r5, r10, medr, meanr, mir, mAP = result_tuple
    with open(path, "a") as fh:
        fh.write(time.asctime(time.localtime(time.time())) + "\t")
        for each in [model_tag, round(r1, 3), round(r5, 3), round(r10, 3),
                     round(medr, 3), round(meanr, 3), round(mir, 3),
                     round(mAP, 3)]:
            fh.write(str(each) + "\t")
        fh.write(parm_adjust.replace("_", "\t"))
        fh.write("\n")


def v2t_metrics(scores: np.ndarray, txt_ids: List[str], vis_ids: List[str]):
    """Video->text metrics over the transposed matrix (reference
    ``predictor.py:261-276``)."""
    from ..eval.metrics import eval_v2t

    return eval_v2t(scores, txt_ids, vis_ids)


def per_head_scores(txt_embs, vis_embs) -> np.ndarray:
    """(H, T, V) per-space similarity matrices (reference
    ``get_txt2vis_matrix_each_head`` / ``predict_each_head``,
    model/model.py:2050-2098)."""
    from ..ops import multi_head_cosine_sim

    return np.asarray(multi_head_cosine_sim(txt_embs, vis_embs, mean=False))


def apply_rerank(
    kind: str, scores: np.ndarray, txt_embs, vis_embs
) -> np.ndarray:
    """Optional post-processing re-rank of the score matrix (reference
    ``predict_rerank``, model/model.py:1130-1406)."""
    from ..eval.rerank import k_reciprocal_rerank, tkb_rerank
    from ..ops.pallas_kernels import flatten_heads

    if kind == "none":
        return scores
    tn = np.asarray(flatten_heads(txt_embs))
    vn = np.asarray(flatten_heads(vis_embs))
    h = txt_embs.shape[1] if txt_embs.ndim == 3 else 1
    q_q = (tn @ tn.T) / h
    g_g = (vn @ vn.T) / h
    if kind == "kreciprocal":
        dist = k_reciprocal_rerank(scores, q_q, g_g)
        return -dist
    if kind == "tkb":
        boost = tkb_rerank(scores, g_g)
        return scores + boost
    raise ValueError(f"unknown rerank '{kind}'")


def concept_rerank_scores(
    opt: PredictOptions,
    scores: np.ndarray,
    txt_ids: List[str],
    vis_ids: List[str],
    tsrc,
) -> np.ndarray:
    """Concept-space re-scoring (reference ``predict_concept_rerank``):
    align this gallery's vis_ids with the concept pkl's columns, blend
    ``scores + weight * concept_sim``, l2-normalize rows."""
    from ..eval.rerank import ConceptRerank, load_word_counts

    if not opt.concept_pkl:
        raise ValueError("--rerank concept needs --concept_pkl")
    with open(opt.concept_pkl, "rb") as fh:
        blob = pickle.load(fh)
    col_of = {v: i for i, v in enumerate(np.asarray(blob["vis_ids"]).tolist())}
    try:
        video_index_list = [col_of[v] for v in vis_ids]
    except KeyError as e:
        raise KeyError(
            f"gallery video {e} missing from concept pkl "
            f"{opt.concept_pkl} vis_ids"
        ) from None
    word_counts = (
        load_word_counts(opt.concept_bow_counts)
        if opt.concept_bow_counts else None
    )
    caption_text = ""
    if opt.concept_caption:
        with open(opt.concept_caption) as fh:
            caption_text = fh.read()
    rr = ConceptRerank(
        opt.concept_pkl, video_index_list, scores,
        [tsrc.captions[t] for t in txt_ids],
        topK=opt.concept_topk, word_counts=word_counts,
        caption_text=caption_text,
    )
    return rr.rerank(weight=opt.concept_weight)


def negation_adjusted_scores(
    scores: np.ndarray,
    neg_scores: np.ndarray,
    neg_mask: np.ndarray,
    method: str = "sub",
) -> np.ndarray:
    """Boolean negation scoring (reference ``predictneg_adhoc``,
    model/model.py:1473-1565): map cosines to [0,1], then subtract (or
    multiply down) the negated-clause similarity for queries that carry a
    negation. ``neg_scores`` rows for mask==0 queries are ignored."""
    s = (scores + 1.0) / 2.0
    ns = np.clip(neg_scores, 0.0, None)
    ns = (ns + 1.0) / 2.0
    ns = ns * neg_mask[:, None] + 0.5 * (1.0 - neg_mask[:, None])
    if method == "sub":
        return s - ns
    if method == "mul":
        return s * (1.0 - ns)
    raise ValueError(f"neg_method {method}")


def embed_negation_split(embedder, txt_feed, tsrc, txt_ids):
    """Split each query on its negation cue and embed both halves through
    the same text tower: the positive clause (the reference scores
    ``poscaps``, not the full query — model/model.py:1530) and the negated
    clause. Returns ``(pos_embs, neg_embs, neg_mask)`` with mask[i]=1 iff
    query i carries a negation; ``(None, None, mask)`` when none does.

    Precomputed text features (CLIP/BERT BigFiles) have no rows for
    synthesized clauses, so the batcher's cap_id-keyed gather reuses the
    query's own rows there — the clause signal then comes from the
    live-encoded modalities (bow/w2v/gru, or a live CLIP tower when one is
    swapped in), mirroring the reference's task3 loaders dropping
    precomputed CLIP (data_provider.py:517-518)."""
    from ..text.textlib import split_negation

    batcher = txt_feed.batcher
    pos_by_id: Dict[str, str] = {}
    neg_by_id: Dict[str, str] = {}
    mask = np.zeros(len(txt_ids), np.float32)
    for i, tid in enumerate(txt_ids):
        positive, negated, has_neg = split_negation(tsrc.captions[tid])
        pos_by_id[tid] = positive
        neg_by_id[tid] = negated if has_neg else ""
        mask[i] = 1.0 if has_neg else 0.0
    if not mask.any():
        return None, None, mask

    from ..data.feed import TextBatcher

    live = [
        name for name, t2v in batcher.featurizers.items()
        if name not in TextBatcher._PRECOMPUTED_KEYS
        or (t2v is not None
            and (getattr(t2v, "emit_tokens", False)
                 or hasattr(t2v, "encode_batch")))
    ]
    if not live:
        logger.warning(
            "NEGATION SCORING IS INERT: every text modality (%s) is a "
            "precomputed feature store keyed by cap_id, so the synthesized "
            "positive/negated clauses reuse the full query's rows and the "
            "negation adjustment carries no signal. Add a live text encoder "
            "(bow/w2v/gru, in-graph BERT, or a StrongCLIP text tower) to "
            "make --task3_caption effective (reference drops precomputed "
            "CLIP in its task3 loaders, data_provider.py:517-518).",
            ", ".join(sorted(batcher.featurizers)),
        )

    def clause_feed(clause_by_id):
        def clause_batcher(cap_ids):
            return batcher.encode_captions(
                [clause_by_id[c] for c in cap_ids], cap_ids
            )

        return EvalFeed(list(txt_ids), clause_batcher,
                        batch_size=txt_feed.batch_size)

    pos_embs, _ = embedder.embed_txt(clause_feed(pos_by_id))
    neg_embs, _ = embedder.embed_txt(clause_feed(neg_by_id))
    return pos_embs, neg_embs, mask


def strongclip_text_featurizer(rootpath: str, test_collection: str,
                               dir_name: str = "clip_finetune_8frame_uniform_1103"):
    """Fine-tuned CLIP text-tower swap (reference ``predictor.py:170-186``):
    load <TextData>/<dir_name>/model_best.pth.tar and encode captions live."""
    import torch

    from ..models.clip import ClipTextTower, import_text_tower, tokenize

    path = os.path.join(rootpath, test_collection, "TextData", dir_name,
                        "model_best.pth.tar")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k[11:]: v for k, v in ckpt["model"].items()}  # strip 'clip_model.'
    prefix = "ClipModel." if any(k.startswith("ClipModel.") for k in sd) else ""
    try:
        # build_model-style shape sniffing so RN50-family / ViT-L text
        # widths load without a hand config (model/clip/model.py:401-438)
        from ..models.clip import infer_clip_config

        cfg = infer_clip_config(sd, prefix=prefix).text
    except KeyError:
        cfg = None  # partial dump: fall back to the ViT-B default
    params = import_text_tower(
        sd, layers=cfg.layers if cfg else 12, prefix=prefix)
    # device arrays, not numpy: the token-embedding lookup indexes by a
    # tracer under jit, which a host ndarray cannot serve
    params = jax.tree.map(jnp.asarray, params)
    tower = ClipTextTower(cfg) if cfg else ClipTextTower()

    _fn = jax.jit(lambda ids: tower.apply({"params": params}, ids))

    class _Live:
        def encode_batch(self, captions):
            return np.asarray(_fn(jnp.asarray(tokenize(list(captions)))))

    logger.info("StrongCLIP text tower loaded from %s", path)
    return _Live()


def rebuild_model(ckpt: Dict):
    """Model + eval variables from a checkpoint payload."""
    spec = ckpt["spec"]
    model = LAFFModel(spec)
    variables = {"params": ckpt["params"]}
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]
    if ckpt.get("schedule"):
        variables["schedule"] = ckpt["schedule"]
    return model, variables, spec


def build_vis_feed(rootpath: str, collection: str, config, batch_size: int,
                   max_frame: Optional[int] = None):
    """Gallery feed over a collection's feature dirs -> (EvalFeed, vis_ids).
    Shared by the batch predictor and the online RetrievalService."""
    from ..data import VisBatcher, VisionSource, read_video_set
    from ..store import BigFile

    vis_files = {
        n: BigFile(os.path.join(rootpath, collection, "FeatureData", n))
        for n in config.vid_feats
    }
    frame_files = None
    if config.frame_feat_input:
        frame_files = {
            n: BigFile(os.path.join(rootpath, collection, "FeatureData",
                                    "frame", n))
            for n in config.vid_frame_feats
        }
    vis_ids = read_video_set(
        os.path.join(rootpath, collection, "VideoSets", collection + ".txt")
    )
    vsrc = VisionSource(vis_files, vis_ids, frame_feat_files=frame_files,
                        max_frame=max_frame or config.max_frame)
    vis_feed = EvalFeed(
        vis_ids, VisBatcher(vsrc, with_frames=config.frame_feat_input),
        batch_size=batch_size,
    )
    return vis_feed, vis_ids


def build_test_feeds(opt: PredictOptions, config, query_set: str, featurizers):
    """Vision + text feeds for a test collection / query set."""
    from ..data import TextBatcher, TextSource
    from .prepare import _text_precomputed

    rootpath = opt.rootpath
    coll = opt.testCollection
    vis_feed, vis_ids = build_vis_feed(rootpath, coll, config, opt.batch_size)

    capfile = os.path.join(rootpath, coll, "TextData", query_set)
    tsrc = TextSource(capfile, precomputed=_text_precomputed(config, capfile))
    active = {k: v for k, v in featurizers.items()}
    tb = TextBatcher(tsrc, active, max_txtlength=config.max_txtlength)
    txt_feed = EvalFeed(tsrc.cap_ids, tb, batch_size=opt.batch_size)
    return vis_feed, txt_feed, tsrc, vis_ids


def rebuild_featurizers(ckpt: Dict, rootpath: str):
    """Re-instantiate the text featurizer bank for inference. Pickled
    featurizer objects in the config (written by prepare, mirroring the
    reference) take priority; otherwise rebuild from the train collection
    on disk."""
    from ..text.txt2vec import BowVec, IndexVec, W2VecNSW
    from .prepare import build_featurizers

    config = ckpt["config"]
    t2v_bow = getattr(config, "t2v_bow", None)
    t2v_idx = getattr(config, "t2v_idx", None)
    if isinstance(t2v_bow, BowVec) or isinstance(t2v_idx, IndexVec):
        featurizers = {}
        te = config.text_encoding
        rnn_encoding = te["rnn_encoding"]["name"].split("_", 1)[0]
        if rnn_encoding in ("gru", "bigru") and t2v_idx is not None:
            featurizers["rnn"] = t2v_idx
        if "no" not in te["bow_encoding"]["name"] and t2v_bow is not None:
            featurizers["bow"] = t2v_bow
        if "no" not in te["w2v_encoding"]["name"]:
            w2v_dir = os.path.join(rootpath, "word2vec", "flickr",
                                   "vec500flickr30m")
            alt = getattr(config, "w2v_dir", None)
            if not os.path.exists(w2v_dir) and alt:
                w2v_dir = os.path.join(rootpath, alt)
            featurizers["w2v"] = W2VecNSW(w2v_dir)
        if "no" not in te["CLIP_encoding"]["name"]:
            featurizers["clip"] = None
        if "no" not in te["bert_encoding"]["name"]:
            if not getattr(config, "bert_frozen", True):
                # in-graph BERT: the feed ships token ids at predict time too
                from ..models.bert import BertTokensFeaturizer

                featurizers["bert"] = BertTokensFeaturizer(
                    te["bert_encoding"]["name"],
                    do_lower_case=getattr(config, "bert_do_lower_case", True),
                    max_length=getattr(config, "bert_max_length", 64),
                    vocab_file=getattr(config, "bert_vocab_file", ""),
                )
            else:
                featurizers["bert"] = None
        return featurizers

    opt_dict = ckpt.get("opt", {})
    train_collection = opt_dict.get("trainCollection", "")
    train_capfile = os.path.join(
        rootpath, train_collection, "TextData", f"{train_collection}.caption.txt"
    )
    featurizers, txt_dims, gru_spec, gru_vocab, we = build_featurizers(
        config, rootpath, train_collection, train_capfile
    )
    return featurizers


def main(opt: PredictOptions) -> Dict:
    from ..utils.misc import enable_compile_cache

    enable_compile_cache()
    ckpt = load_checkpoint(opt.model_path)
    config = ckpt["config"]
    model, variables, spec = rebuild_model(ckpt)
    mesh = None
    if opt.data_parallel > 0:
        n = min(opt.data_parallel, len(jax.devices()))
        if n > 1:
            from ..parallel import data_parallel_mesh, replicate

            if opt.batch_size % n:
                raise ValueError(
                    f"batch_size {opt.batch_size} must divide by the "
                    f"data_parallel mesh size {n}"
                )
            mesh = data_parallel_mesh(n)
            variables = replicate(variables, mesh)
            logger.info("data-parallel inference over %d devices", n)
        else:
            logger.warning("data_parallel requested but only %d device(s)",
                           len(jax.devices()))
    embedder = Embedder(model, variables,
                        prefetch_depth=max(2, opt.num_workers), mesh=mesh)
    featurizers = rebuild_featurizers(ckpt, opt.rootpath)

    # StrongCLIP: swap in a fine-tuned live text tower when the config
    # says so and the checkpoint exists (reference predictor.py:170-186)
    if "StrongCLIP" in str(type(config).__module__) + str(
        getattr(config, "model_name", "")
    ) or "StrongCLIP" in str(ckpt.get("opt", {}).get("config_name", "")):
        try:
            dir_name = config.text_encoding["CLIP_encoding"].get(
                "dir_name", "clip_finetune_8frame_uniform_1103"
            )
            featurizers["clip"] = strongclip_text_featurizer(
                opt.rootpath, opt.testCollection, dir_name
            )
        except Exception as e:
            logger.warning("StrongCLIP text tower load failed: %s", e)
    parm_adjust = str(ckpt.get("opt", {}).get("parm_adjust_config", "None"))

    rootpath = opt.rootpath
    coll = opt.testCollection
    results = {}
    vis_embs = None

    for query_set in opt.query_sets.split(","):
        output_dir = os.path.join(rootpath, coll, "SimilarityIndex", query_set,
                                  opt.sim_name)
        pred_result_file = os.path.join(output_dir, "id.sent.score.txt")
        if check_to_skip(pred_result_file, opt.overwrite):
            continue
        makedirs(output_dir)

        vis_feed, txt_feed, tsrc, vis_ids = build_test_feeds(
            opt, config, query_set, featurizers
        )
        measure = getattr(config, "measure", "cosine")
        txt_embs, txt_ids = embedder.embed_txt(txt_feed)
        streaming_eval = None
        if len(vis_ids) > LARGE_GALLERY:
            is_benchmark = (coll not in AVS_COLLECTIONS
                            and query_set != "simple_query.txt")
            if (is_benchmark and opt.rerank == "none"
                    and opt.task3_caption == "no_task3_caption"
                    and measure == "cosine"):
                # large BENCHMARK gallery: metrics + top-k dump via
                # two-pass device counting — never a host (T, V) matrix
                from .evaluator import streaming_benchmark_eval

                streaming_eval = streaming_benchmark_eval(
                    # top-2000 like the reference dump threshold
                    # (txt2video_write_to_file Threshold=2000)
                    embedder, txt_embs, txt_ids, vis_feed, topk=2000
                )
                vis_ids = streaming_eval["vis_ids"]
                scores, vis_embs = None, None
            elif (opt.int8_gallery and not is_benchmark
                    and opt.rerank == "none"
                    and opt.task3_caption == "no_task3_caption"
                    and measure == "cosine"):
                # AVS serving at 2x gallery capacity: int8 HBM gallery
                # nominates, only candidate videos are re-embedded for
                # exact dump scores (laff_tpu.ops.quantized)
                from .evaluator import int8_streaming_topk

                i8_vals, i8_idx, vis_ids = int8_streaming_topk(
                    embedder, txt_embs, vis_feed, k=2000
                )
                streaming_eval = {"topk_idx": i8_idx, "topk_vals": i8_vals,
                                  "vis_ids": vis_ids, "int8": True}
                scores, vis_embs = None, None
            else:
                # AVS-scale gallery (or rerank/negation needing full
                # scores over few queries): stream blocks, never cache
                # embeddings (reference predict_batch path)
                scores, vis_ids = score_matrix_streaming(
                    embedder, txt_embs, vis_feed
                )
                vis_embs = None
        else:
            if vis_embs is None:  # cache across query sets (record_emb parity)
                vis_embs, vis_ids = embedder.embed_vis(vis_feed)
            scores = score_matrix(txt_embs, vis_embs, measure=measure)

        scores_adjusted = False
        if opt.task3_caption != "no_task3_caption":
            # boolean negation scoring (reference predictneg_adhoc,
            # model/model.py:1473-1565): score the positive clause, then
            # demote videos matching the negated clause of each query
            pos_embs, neg_embs, neg_mask = embed_negation_split(
                embedder, txt_feed, tsrc, txt_ids
            )
            if neg_embs is not None:
                scores_adjusted = True
                if vis_embs is None:
                    pos_scores, _ = score_matrix_streaming(
                        embedder, pos_embs, vis_feed
                    )
                    neg_scores, _ = score_matrix_streaming(
                        embedder, neg_embs, vis_feed
                    )
                else:
                    pos_scores = score_matrix(pos_embs, vis_embs,
                                              measure=measure)
                    neg_scores = score_matrix(neg_embs, vis_embs,
                                              measure=measure)
                scores = negation_adjusted_scores(
                    pos_scores, neg_scores, neg_mask, method=opt.neg_method
                )
                logger.info(
                    "negation scoring (%s): %d/%d queries carry a negation",
                    opt.neg_method, int(neg_mask.sum()), len(txt_ids),
                )
            else:
                logger.warning(
                    "task3_caption=%s set but no query contains a negation "
                    "cue; scores unchanged", opt.task3_caption,
                )

        if opt.rerank == "concept":
            scores = concept_rerank_scores(opt, scores, txt_ids, vis_ids, tsrc)
        elif opt.rerank != "none":
            scores = apply_rerank(opt.rerank, scores, txt_embs, vis_embs)

        if coll not in AVS_COLLECTIONS and query_set != "simple_query.txt":
            if streaming_eval is not None:
                t2v = streaming_eval["t2v"]
            elif opt.rerank != "none" or scores_adjusted or vis_embs is None:
                from ..eval.metrics import eval_t2v

                t2v = eval_t2v(scores, txt_ids, vis_ids)
            else:
                ranks = t2v_ranks(txt_embs, vis_embs, txt_ids, vis_ids,
                                  measure=measure)
                t2v = metrics_from_ranks(ranks)
            result_dir = os.path.dirname(opt.predict_result_file)
            result_name = os.path.basename(opt.predict_result_file)
            append_result_row(
                os.path.join(result_dir, "TextToVideo", result_name),
                opt.model_path + "\t" + coll, parm_adjust, t2v,
            )
            write_rank_dump(
                None, scores, txt_ids, vis_ids,
                pkl_path=os.path.join(output_dir, "t2v.pkl"),
                captions=tsrc.captions, threshold=500,
                topk_rankings=(
                    (streaming_eval["topk_idx"], streaming_eval["topk_vals"])
                    if streaming_eval is not None else None
                ),
            )
            if streaming_eval is not None:
                v2t = streaming_eval["v2t"]
            else:
                v2t = v2t_metrics(scores, txt_ids, vis_ids)
            append_result_row(
                os.path.join(result_dir, "VideoToText", result_name),
                opt.model_path + "\t" + coll, parm_adjust, v2t,
            )
            results[query_set] = {"t2v": t2v, "v2t": v2t}
            logger.info(
                "%s t2v r1=%.2f r5=%.2f r10=%.2f medr=%.0f mir=%.4f",
                query_set, t2v[0], t2v[1], t2v[2], t2v[3], t2v[5],
            )
            if opt.each_head and txt_embs.ndim == 3 and vis_embs is not None:
                # per-space artifacts (reference get_multi_predict_file,
                # predictor.py:290-405). The reference overwrites ONE
                # perf.txt / id.sent.score.txt per head so only the last
                # head's dump survives; we name every artifact by head.
                from ..eval.metrics import eval_t2v

                head_scores = per_head_scores(txt_embs, vis_embs)
                per_head = []
                perf_blocks = []
                for h in range(head_scores.shape[0]):
                    m = eval_t2v(head_scores[h], txt_ids, vis_ids)
                    per_head.append(m)
                    append_result_row(
                        os.path.join(result_dir, "TextToVideo",
                                     f"head{h}_" + result_name),
                        opt.model_path + "\t" + coll, parm_adjust, m,
                    )
                    r1, r5, r10, medr, meanr, mir, mAP = m
                    perf_blocks.append(
                        f" * Text to video head{h}:\n"
                        f" * r_1_5_10: {[round(r1, 3), round(r5, 3), round(r10, 3)]}\n"
                        f" * medr, meanr, mir: "
                        f"{[round(medr, 3), round(meanr, 3), round(mir, 3)]}\n"
                        f" * mAP: {round(mAP, 3)}\n * " + "-" * 10
                    )
                    write_rank_dump(
                        os.path.join(output_dir, f"head{h}.id.sent.score.txt"),
                        head_scores[h], txt_ids, vis_ids,
                    )
                with open(os.path.join(output_dir, "perf.txt"), "w") as fh:
                    fh.write("\n".join(perf_blocks) + "\n")
                results[query_set]["per_head"] = per_head
        else:
            i8 = streaming_eval if (
                streaming_eval is not None and streaming_eval.get("int8")
            ) else None
            write_rank_dump(
                None, scores, txt_ids, vis_ids,
                pkl_path=os.path.join(output_dir, "t2v.pkl"),
                captions=tsrc.captions, threshold=500,
                topk_rankings=(
                    (i8["topk_idx"][:, :500], i8["topk_vals"][:, :500])
                    if i8 is not None else None
                ),
            )
            write_rank_dump(
                pred_result_file, scores, txt_ids, vis_ids,
                topk_rankings=(
                    (i8["topk_idx"], i8["topk_vals"])
                    if i8 is not None else None
                ),
            )
            logger.info("wrote %s", pred_result_file)
            results[query_set] = {"score_file": pred_result_file}

    return results
