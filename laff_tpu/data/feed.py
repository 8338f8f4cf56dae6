"""Fixed-shape batchers + a prefetching host->device feed.

TPU-first replacement for the reference DataLoader/collate stack
(``data_provider.py:26-152, 812-870``):

* Text featurization (BoW counts, w2v mean-pool, GRU index padding) is
  vectorized host work done *in the feed*, not inside the model forward
  (the reference encodes per caption inside the torch graph,
  ``model/model.py:404-434``, which would starve a TPU).
* Every batch has a static shape: the train feed drops the trailing
  partial batch; eval feeds pad the final batch and report the valid count
  so jit never retraces.
* ``Prefetcher`` overlaps the host featurization + H2D copy of batch k+1
  with device compute on batch k (double buffering over the PCIe/ICI DMA),
  the classic input-pipeline pattern the reference lacked.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from ..text.txt2vec import IndexVec, Txt2Vec
from .sources import TextSource, VisionSource, vis_id_of


def host_cast_bf16(arrs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Round float32 feature arrays to bfloat16 ON THE HOST before device
    transfer. For towers that compute in bfloat16 the first device op is
    exactly this cast (round-to-nearest-even both places), so results are
    bit-identical — but the bytes over PCIe/tunnel/DCN are halved, and
    feature transfer is the training bottleneck on bandwidth-starved
    links. Integer arrays (token ids, lengths) pass through untouched."""
    import ml_dtypes

    return {
        k: v.astype(ml_dtypes.bfloat16)
        if isinstance(v, np.ndarray) and v.dtype == np.float32 else v
        for k, v in arrs.items()
    }


class TextBatcher:
    """cap_ids -> model-ready dense text arrays.

    featurizers:
      'bow' / 'w2v': Txt2Vec instances -> (B, D)
      'rnn': IndexVec -> 'rnn_ids' (B, max_txtlength) + 'rnn_len' (B,)
      'clip' / 'bert': taken from TextSource.precomputed ('CLIP_encoding',
      'bert_encoding' BigFiles) -> (B, D)
    """

    _PRECOMPUTED_KEYS = {"clip": "CLIP_encoding", "bert": "bert_encoding"}

    def __init__(
        self,
        source: TextSource,
        featurizers: Dict[str, Txt2Vec],
        max_txtlength: int = 77,
        indexed_bow: bool = False,
        indexed_w2v: bool = False,
        pad_full: bool = False,
    ) -> None:
        self.source = source
        self.featurizers = featurizers
        self.max_txtlength = max_txtlength
        # pad variable-width arrays (netvlad tokens) to max_txtlength
        # instead of the batch max: serving needs fixed shapes so every
        # request reuses one compiled text tower
        self.pad_full = pad_full
        # ship bow as (ids, counts) pairs and densify on device
        # (FusionTower scatter) — shrinks the per-caption transfer from a
        # vocab-wide dense row to ~max_txtlength int32/f32 pairs
        self.indexed_bow = indexed_bow
        # ship w2v as (ids, n) row indices into a device-resident table
        # (the train step mean-pools on device); needs the w2v featurizer's
        # build_row_index to have run
        self.indexed_w2v = indexed_w2v

    def __call__(self, cap_ids: Sequence[str]) -> Dict[str, np.ndarray]:
        captions = self.source.captions_for(cap_ids)
        return self.encode_captions(captions, cap_ids)

    def encode_captions(
        self,
        captions: Sequence[str],
        cap_ids: Optional[Sequence[str]] = None,
    ) -> Dict[str, np.ndarray]:
        batch: Dict[str, np.ndarray] = {}
        precomputed = None
        for name, t2v in self.featurizers.items():
            if name == "rnn":
                assert isinstance(t2v, IndexVec)
                ids, lengths = t2v.encode_batch_padded(captions, self.max_txtlength)
                batch["rnn_ids"] = ids
                batch["rnn_len"] = lengths
            elif name == "netvlad":
                # raw per-token w2v vectors, padded + masked
                tokens, mask = self._netvlad_tokens(t2v, captions)
                batch["netvlad_tokens"] = tokens
                batch["netvlad_mask"] = mask
            elif name in self._PRECOMPUTED_KEYS:
                if t2v is not None and getattr(t2v, "emit_tokens", False):
                    # in-graph tower: ship token arrays, not features
                    batch.update(t2v.encode_tokens(captions))
                    continue
                if t2v is not None and hasattr(t2v, "encode_batch"):
                    # live tower (e.g. StrongCLIP fine-tuned text encoder)
                    batch[name] = t2v.encode_batch(captions)
                    continue
                if cap_ids is None:
                    raise ValueError(f"{name} features need cap_ids")
                if precomputed is None:
                    precomputed = self.source.gather_precomputed(cap_ids)
                batch[name] = precomputed[self._PRECOMPUTED_KEYS[name]]
            elif name == "bow" and self.indexed_bow:
                ids, cnt = t2v.encode_batch_indexed(captions, self.max_txtlength)
                batch["bow_ids"] = ids
                batch["bow_cnt"] = cnt
            elif name == "w2v" and self.indexed_w2v:
                ids, n = t2v.encode_batch_indexed(captions, self.max_txtlength)
                batch["w2v_ids"] = ids
                batch["w2v_len"] = n
            else:
                batch[name] = t2v.encode_batch(captions)
        return batch

    def _netvlad_tokens(self, w2v, captions):
        rows = [w2v.raw_encoding(c) for c in captions]
        max_t = (self.max_txtlength if self.pad_full
                 else min(max(r.shape[0] for r in rows), self.max_txtlength))
        dim = rows[0].shape[1]
        tokens = np.zeros((len(rows), max_t, dim), np.float32)
        mask = np.zeros((len(rows), max_t), np.float32)
        for i, r in enumerate(rows):
            t = min(r.shape[0], max_t)
            tokens[i, :t] = r[:t]
            mask[i, :t] = 1.0
        return tokens, mask


class VisBatcher:
    """vis_ids -> model-ready visual arrays (video-level + padded frames).

    ``task2_labels`` (vis_id -> multi-hot concept row) rides the batch as
    ``task2_labels`` so the HBM feature cache and the scan stacks carry it
    like any other per-video array; videos without an object caption get
    zeros."""

    def __init__(self, source: VisionSource, with_frames: bool = False,
                 task2_labels: Optional[Dict[str, np.ndarray]] = None) -> None:
        self.source = source
        self.with_frames = with_frames
        self.task2_labels = task2_labels
        self._task2_zero = None
        if task2_labels is not None:
            if not task2_labels:
                raise ValueError(
                    "task2_labels is empty: no object captions were parsed "
                    "from the task2 caption file"
                )
            dim = len(next(iter(task2_labels.values())))
            self._task2_zero = np.zeros((dim,), np.float32)

    def __call__(self, vis_ids: Sequence[str]) -> Dict[str, np.ndarray]:
        batch = dict(self.source.gather(vis_ids))
        if self.with_frames:
            batch.update(self.source.gather_frames(vis_ids))
        if self.task2_labels is not None:
            zero = self._task2_zero
            batch["task2_labels"] = np.stack(
                [self.task2_labels.get(v, zero) for v in vis_ids]
            )
        return batch


def _chunks(ids: List[str], batch_size: int, drop_last: bool) -> Iterator[List[str]]:
    n = len(ids)
    end = (n // batch_size) * batch_size if drop_last else n
    for start in range(0, end, batch_size):
        yield ids[start : start + batch_size]


class PairFeed:
    """Training feed: shuffled (caption, video) pairs in fixed-size batches.

    Yields dicts {'txt': {...}, 'vis': {...}, 'cap_ids': [...]}. The
    trailing partial batch is dropped so the jitted train step sees one
    static shape (torch-DataLoader semantics kept otherwise).

    With a ``task3_source`` (negation caption set, reference
    ``data_provider.py:649-684``) each batch additionally carries
    'false_txt' (false-caption features, zeros when absent) and
    'task3_mask' (1 positive pair, 0 negative, -1 no entry); captions with
    a positive negation entry are randomly swapped for a
    negation-augmented variant.
    """

    def __init__(
        self,
        text_batcher: TextBatcher,
        vis_batcher: VisBatcher,
        batch_size: int = 128,
        seed: int = 0,
        task3_source: Optional[TextSource] = None,
        cap_ids: Optional[Sequence[str]] = None,
    ) -> None:
        self.text_batcher = text_batcher
        self.vis_batcher = vis_batcher
        self.batch_size = batch_size
        self.seed = seed
        # cap_ids: optional subset (train_strategy='subset' splits one
        # collection into train/holdout, reference trainer.py:477-482)
        self.cap_ids = list(cap_ids if cap_ids is not None
                            else text_batcher.source.cap_ids)
        self.task3_source = task3_source
        self._augmented = (
            task3_source.negation_augmented() if task3_source is not None else {}
        )
        # device-resident caches (engine/feature_cache.py) gather features
        # by id on device; the trainer flips these off so epochs skip the
        # host featurization work and batches carry only id lists
        self.featurize_txt = True
        self.featurize_vis = True

    def steps_per_epoch(self) -> int:
        return len(self.cap_ids) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict]:
        import random as _random

        order = np.random.default_rng(self.seed + epoch).permutation(len(self.cap_ids))
        shuffled = [self.cap_ids[i] for i in order]
        pyrng = _random.Random(self.seed * 1000 + epoch)
        for chunk in _chunks(shuffled, self.batch_size, drop_last=True):
            vis_ids = [vis_id_of(c) for c in chunk]
            batch = {
                "cap_ids": chunk,
                "vis_ids": vis_ids,
            }
            if self.featurize_vis:
                batch["vis"] = self.vis_batcher(vis_ids)
            if self.task3_source is None:
                if self.featurize_txt:
                    batch["txt"] = self.text_batcher(chunk)
            else:
                captions = []
                false_captions = []
                masks = np.full((len(chunk),), -1, dtype=np.int32)
                for i, cap_id in enumerate(chunk):
                    caption = self.text_batcher.source.caption(cap_id)
                    false_cap, mask = self.task3_source.false_caption(cap_id, pyrng)
                    masks[i] = mask
                    if mask == 1 and cap_id in self._augmented:
                        caption = pyrng.choice(self._augmented[cap_id])
                    captions.append(caption)
                    false_captions.append(false_cap or "")
                batch["txt"] = self.text_batcher.encode_captions(captions, chunk)
                batch["false_txt"] = self.text_batcher.encode_captions(
                    false_captions, chunk
                )
                batch["task3_mask"] = masks
            yield batch


class EvalFeed:
    """Deterministic feed over all items; final batch zero-padded to the
    batch size with 'valid' giving the real count."""

    def __init__(
        self,
        ids: Sequence[str],
        batcher: Callable[[Sequence[str]], Dict[str, np.ndarray]],
        batch_size: int = 512,
        pad: bool = True,
    ) -> None:
        self.ids = list(ids)
        self.batcher = batcher
        self.batch_size = batch_size
        self.pad = pad

    def __len__(self) -> int:
        return len(self.ids)

    def __iter__(self) -> Iterator[Dict]:
        for chunk in _chunks(self.ids, self.batch_size, drop_last=False):
            valid = len(chunk)
            padded_chunk = chunk
            if self.pad and valid < self.batch_size:
                padded_chunk = chunk + [chunk[-1]] * (self.batch_size - valid)
            batch = self.batcher(padded_chunk)
            yield {"data": batch, "ids": chunk, "valid": valid}


class Prefetcher:
    """Runs an iterator in a background thread, optionally pushing each
    element to device, keeping ``depth`` batches in flight."""

    _DONE = object()

    def __init__(
        self,
        iterator: Iterable,
        depth: int = 2,
        transfer: Optional[Callable] = None,
    ) -> None:
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._transfer = transfer
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for item in iterator:
                    if self._transfer is not None:
                        item = self._transfer(item)
                    self._queue.put(item)
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                self._queue.put(self._DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
