"""Post-processing re-rankers (reference ``model/ReRank.py``).

* ``k_reciprocal_rerank`` — the CVPR'17 person-reID k-reciprocal encoding
  blend (reference 19-104), numpy, with the neighbor-expansion loops kept
  host-side (irregular set ops) but the distance/weight algebra vectorized.
* ``tkb_rerank`` — gallery-popularity log-count boost over the top-K
  (reference 107-159).
* ``ConceptRerank`` — CLIP video<->concept similarity + idf-weighted
  query-concept matching as an additive concept-space score (reference
  161-371). Lemmatization uses nltk when importable, else a light
  suffix-stripping fallback, so the module has no hard nltk dependency.
"""

from __future__ import annotations

import pickle
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..text.textlib import ENGLISH_STOP_WORDS
from ..utils import get_logger

logger = get_logger(__name__)


def _k_reciprocal_neigh(initial_rank: np.ndarray, i: int, k1: int) -> np.ndarray:
    forward = initial_rank[i, : k1 + 1]
    backward = initial_rank[forward, : k1 + 1]
    fi = np.where(backward == i)[0]
    return forward[fi]


def k_reciprocal_rerank(
    q_g_sim: np.ndarray,
    q_q_sim: np.ndarray,
    g_g_sim: np.ndarray,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
) -> np.ndarray:
    """k-reciprocal re-ranking over cosine *similarities*; returns a
    re-ranked DISTANCE matrix (lower = better), like the reference."""
    query_num = q_g_sim.shape[0]
    original_dist = np.concatenate(
        [
            np.concatenate([q_q_sim, q_g_sim], axis=1),
            np.concatenate([q_g_sim.T, g_g_sim], axis=1),
        ],
        axis=0,
    )
    original_dist = 2.0 - 2.0 * original_dist  # cosine -> squared euclidean
    original_dist = (original_dist / np.max(original_dist, axis=0)).T
    all_num = original_dist.shape[0]
    V = np.zeros_like(original_dist, dtype=np.float32)
    initial_rank = np.argpartition(original_dist, range(1, k1 + 1))

    for i in range(all_num):
        k_reciprocal_index = _k_reciprocal_neigh(initial_rank, i, k1)
        expansion = k_reciprocal_index
        for candidate in k_reciprocal_index:
            cand_idx = _k_reciprocal_neigh(
                initial_rank, candidate, int(np.around(k1 / 2))
            )
            if len(np.intersect1d(cand_idx, k_reciprocal_index)) > (
                2.0 / 3 * len(cand_idx)
            ):
                expansion = np.append(expansion, cand_idx)
        expansion = np.unique(expansion)
        weight = np.exp(-original_dist[i, expansion])
        V[i, expansion] = weight / np.sum(weight)

    original_dist = original_dist[:query_num]
    if k2 != 1:
        V = np.stack([np.mean(V[initial_rank[i, :k2], :], axis=0)
                      for i in range(all_num)])

    inv_index = [np.where(V[:, i] != 0)[0] for i in range(all_num)]
    jaccard_dist = np.zeros_like(original_dist, dtype=np.float32)
    for i in range(query_num):
        temp_min = np.zeros((all_num,), dtype=np.float32)
        ind_nonzero = np.where(V[i, :] != 0)[0]
        for j, ind in enumerate(ind_nonzero):
            imgs = inv_index[ind]
            temp_min[imgs] += np.minimum(V[i, ind], V[imgs, ind])
        jaccard_dist[i] = 1 - temp_min / (2.0 - temp_min)

    final_dist = jaccard_dist * (1 - lambda_value) + original_dist * lambda_value
    return final_dist[:, query_num:]


def tkb_rerank(
    q_g_sim: np.ndarray, g_g_sim: np.ndarray, topK: int = 3000, k1: int = 20
) -> np.ndarray:
    """Gallery-popularity boost: count how often each video appears among
    the k1 nearest neighbors of all videos; re-score each query's top-K by
    log(count+1), row-l2-normalized (reference 107-159)."""
    n_g = q_g_sim.shape[1]
    counts = np.zeros(n_g, dtype=np.float64)
    neighbor_idx = np.argsort(g_g_sim, axis=1)[:, ::-1][:, :k1]
    counts += np.bincount(np.arange(n_g), minlength=n_g)  # self counts
    counts += np.bincount(neighbor_idx.ravel(), minlength=n_g)

    reranked = np.zeros_like(q_g_sim, dtype=np.float64)
    top_idx = np.argsort(q_g_sim, axis=1)[:, ::-1][:, :topK]
    log_counts = np.log(counts + 1.0)
    for q in range(q_g_sim.shape[0]):
        reranked[q, top_idx[q]] = log_counts[top_idx[q]]
    norms = np.sqrt((reranked ** 2).sum(axis=1, keepdims=True)) + 1e-13 + 1e-14
    return reranked / norms


_CLEAN_RE = re.compile(r"[^A-Za-z0-9]")


def _lemmatize_query(text: str) -> str:
    """POS-filtered lemmatization when nltk is available, stopword-filtered
    tokens otherwise."""
    text = _CLEAN_RE.sub(" ", text).strip().lower()
    try:
        import nltk
        from nltk import pos_tag, word_tokenize
        from nltk.corpus import wordnet
        from nltk.stem import WordNetLemmatizer

        tokens = word_tokenize(text)
        tagged = pos_tag(tokens)
        wnl = WordNetLemmatizer()
        out = []
        for word, tag in tagged:
            if tag.startswith("J"):
                pos = wordnet.ADJ
            elif tag.startswith("V"):
                pos = wordnet.VERB
            elif tag.startswith("N"):
                pos = wordnet.NOUN
            else:
                continue
            w = wnl.lemmatize(word, pos=pos)
            if w not in ENGLISH_STOP_WORDS:
                out.append(w)
        return " ".join(out)
    except Exception:
        return " ".join(
            t for t in text.split() if t not in ENGLISH_STOP_WORDS
        )


class ConceptRerank:
    """Concept-space re-scoring (reference ``ReRank.py:161-371``).

    video_concept pkl: {'txt2video_cos_sim_matrix': (C, V_all),
    'txt_ids': concept strings, 'vis_ids': video ids}.
    """

    def __init__(
        self,
        video_concept_pkl_path: str,
        video_index_list: Sequence[int],
        model_sim_matrix: np.ndarray,
        query_txts: List[str],
        topK: int = 2000,
        idf_log_base: float = np.e,
        word_counts: Optional[Dict[str, int]] = None,
        caption_text: str = "",
    ) -> None:
        self.idf_log_base = idf_log_base
        with open(video_concept_pkl_path, "rb") as fh:
            blob = pickle.load(fh)
        self.concept_ids = list(blob["txt_ids"])
        video_concept = np.asarray(blob["txt2video_cos_sim_matrix"])[
            :, list(video_index_list)
        ].T  # (V, C)

        # idf weights from train-corpus word counts (vocab count file) with
        # a substring-count fallback over the caption text
        counts = dict(word_counts or {})
        freq = {}
        for c in self.concept_ids:
            if c in counts:
                freq[c] = counts[c]
            else:
                freq[c] = caption_text.count(c)
        total = sum(freq.values())
        idf = np.array(
            [
                np.log((1 + total) / (freq[c] + 1)) / np.log(self.idf_log_base)
                for c in self.concept_ids
            ]
        )
        self.concept_freq = freq
        self.video_concept = video_concept * idf[None, :]

        self.model_sim_matrix = np.asarray(model_sim_matrix)
        inds = np.argsort(self.model_sim_matrix, axis=1)
        self.top_idx = inds[:, ::-1][:, :topK]
        self.query_list = [_lemmatize_query(q) for q in query_txts]
        self.query_concept = self._query_concept_matrix()

    def _query_concept_matrix(self) -> np.ndarray:
        mat = np.zeros((len(self.query_list), len(self.concept_ids)))
        for i, q in enumerate(self.query_list):
            for j, c in enumerate(self.concept_ids):
                if c in q:
                    mat[i, j] = 1.0
        return mat

    def concept_sim_matrix(self) -> np.ndarray:
        """Cosine between query-concept indicators and idf-weighted video
        concepts, zeroed outside each query's model top-K."""

        def l2n(x):
            return x / (np.sqrt((x * x).sum(1, keepdims=True)) + 1e-13 + 1e-14)

        sims = l2n(self.query_concept) @ l2n(self.video_concept).T
        out = np.zeros_like(sims)
        for q in range(sims.shape[0]):
            out[q, self.top_idx[q]] = sims[q, self.top_idx[q]]
        return out

    def rerank(self, weight: float = 2.0, l2norm_rows: bool = True) -> np.ndarray:
        """model_sim + weight * concept_sim, rows l2-normalized (reference
        ``predict_concept_rerank``, model/model.py:1391-1405: Concept_weight
        default 2, final ``l2norm``)."""
        out = self.model_sim_matrix + weight * self.concept_sim_matrix()
        if l2norm_rows:
            norms = np.sqrt((out * out).sum(1, keepdims=True)) + 1e-13 + 1e-14
            out = out / norms
        return out


def load_word_counts(path: str) -> Dict[str, int]:
    """Parse a vocab count file ('word count' per line, the
    ``bow_nsw_5.txt`` format the reference build_vocab writes)."""
    counts: Dict[str, int] = {}
    with open(path) as fh:
        for line in fh:
            parts = line.strip().split()
            if len(parts) >= 2:
                counts[parts[0]] = int(parts[1])
    return counts
