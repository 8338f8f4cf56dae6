"""Data sources: captions and feature stores for one collection.

Replaces the reference torch Datasets (``data_provider.py:380-698``) with
plain numpy-backed sources. There are no worker processes: batching is
vectorized gathers against memory-mapped BigFiles plus cached tokenization,
run ahead of the device by the prefetch thread in laff_tpu.data.feed.

Collection layout (unchanged from the reference, so existing dumps work):
  <root>/<collection>/FeatureData/<feat_name>/{feature.bin,id.txt,shape.txt}
  <root>/<collection>/TextData/<capfile>.caption.txt    ("cap_id caption")
  <root>/<collection>/TextData/<dir_name>/              (precomputed text feats)
  <root>/<collection>/VideoSets/<collection>.txt        (video id list)
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..store import BigFile
from ..text.textlib import negation_augmentation
from ..utils import get_logger

logger = get_logger(__name__)


class VisionSource:
    """Video-level (and optionally frame-level) feature access for a set of
    video ids."""

    def __init__(
        self,
        feat_files: Dict[str, BigFile],
        vis_ids: Sequence[str],
        frame_feat_files: Optional[Dict[str, BigFile]] = None,
        max_frame: int = 200,
    ) -> None:
        self.feat_files = feat_files
        self.vis_ids = list(vis_ids)
        self.max_frame = max_frame
        self.frame_feat_files = frame_feat_files or {}
        # frame ids are '<videoid>_<frameidx>'; group and sort numerically
        # (reference data_provider.py:430-446)
        self.vid2frames: Dict[str, Dict[str, List[str]]] = {}
        for fname, bf in self.frame_feat_files.items():
            groups: Dict[str, List[str]] = {}
            for frame_id in bf.names:
                video_id = "_".join(frame_id.split("_")[:-1])
                groups.setdefault(video_id, []).append(frame_id)
            for vid in groups:
                groups[vid].sort(key=lambda x: int(x.split("_")[-1]))
            self.vid2frames[fname] = groups

    def __len__(self) -> int:
        return len(self.vis_ids)

    def gather(self, vis_ids: Sequence[str]) -> Dict[str, np.ndarray]:
        """Video-level features: feature name -> (B, D)."""
        out = {}
        for name, bf in self.feat_files.items():
            found, arr = bf.gather(vis_ids)
            if len(found) != len(vis_ids):
                missing = set(vis_ids) - set(found)
                raise KeyError(f"feature '{name}' missing ids: {sorted(missing)[:5]}")
            out[name] = arr
        return out

    def gather_frames(
        self, vis_ids: Sequence[str], pad_to: Optional[int] = None
    ) -> Dict[str, np.ndarray]:
        """Frame features: '<name>@frames' (B, T, D) + '<name>@mask' (B, T),
        frames capped at max_frame and right-padded."""
        out = {}
        t_max = pad_to or self.max_frame
        for fname, bf in self.frame_feat_files.items():
            groups = self.vid2frames[fname]
            frames = np.zeros((len(vis_ids), t_max, bf.ndims), dtype=np.float32)
            mask = np.zeros((len(vis_ids), t_max), dtype=np.float32)
            for i, vid in enumerate(vis_ids):
                ids = groups.get(vid, [])[: t_max]
                if not ids:
                    continue
                _, arr = bf.gather(ids)
                frames[i, : len(ids)] = arr
                mask[i, : len(ids)] = 1.0
            out[f"{fname}@frames"] = frames
            out[f"{fname}@mask"] = mask
        return out


class TextSource:
    """Caption file access with cached parsing; optionally precomputed text
    features (CLIP/BERT BigFiles) and the negation ('task3') caption set."""

    def __init__(
        self,
        capfile: str,
        precomputed: Optional[Dict[str, BigFile]] = None,
        task3: bool = False,
        shuffle_seed: Optional[int] = None,
    ) -> None:
        self.capfile = capfile
        self.precomputed = precomputed or {}
        self.captions: Dict[str, str] = {}
        self.cap_ids: List[str] = []
        self.mask_task3: Dict[str, int] = {}
        self.task3 = task3

        with open(capfile, "r") as fh:
            lines = [l for l in fh.readlines() if l.strip()]
        if task3:
            # negation set: ids like 'video1#3p' / 'video1#3Fn'; p=positive
            # (reference data_provider.py:529-549)
            if shuffle_seed is not None:
                random.Random(shuffle_seed).shuffle(lines)
            self.captions_multi: Dict[str, List[str]] = {}
            for line in lines:
                cap_idfull, caption = line.strip().split(None, 1)
                base, tail = cap_idfull.split("#")
                cap_id = base + "#" + tail.split("F")[0]
                self.mask_task3[cap_id] = 1 if "p" in cap_idfull else 0
                if cap_id not in self.captions_multi:
                    self.captions_multi[cap_id] = [caption]
                    self.cap_ids.append(cap_id)
                else:
                    self.captions_multi[cap_id].append(caption)
        else:
            for line in lines:
                parts = line.strip().split(None, 1)
                cap_id = parts[0]
                caption = parts[1] if len(parts) == 2 else ""
                self.captions[cap_id] = caption
                self.cap_ids.append(cap_id)

        self.length = len(self.cap_ids)

    def __len__(self) -> int:
        return self.length

    def caption(self, cap_id: str) -> str:
        return self.captions[cap_id]

    def captions_for(self, cap_ids: Sequence[str]) -> List[str]:
        return [self.captions[c] for c in cap_ids]

    def gather_precomputed(self, cap_ids: Sequence[str]) -> Dict[str, np.ndarray]:
        out = {}
        for name, bf in self.precomputed.items():
            found, arr = bf.gather(cap_ids)
            if len(found) != len(cap_ids):
                missing = set(cap_ids) - set(found)
                raise KeyError(
                    f"precomputed text feature '{name}' missing: {sorted(missing)[:5]}"
                )
            out[name] = arr
        return out

    def false_caption(self, cap_id: str, rng: random.Random) -> Tuple[Optional[str], int]:
        """A random false caption + mask for the negation loss
        (reference ``data_provider.py:598-615``): mask 1=positive pair,
        0=negative, -1=no entry."""
        if not self.task3 or cap_id not in self.captions_multi:
            return None, -1
        return rng.choice(self.captions_multi[cap_id]), self.mask_task3[cap_id]

    def negation_augmented(self) -> Dict[str, List[str]]:
        out = {}
        for cap_id, mask in self.mask_task3.items():
            if mask:
                out[cap_id] = [
                    aug
                    for cap in self.captions_multi[cap_id]
                    for aug in negation_augmentation(cap)
                ]
        return out


def vis_id_of(cap_id: str) -> str:
    """cap_id 'video123#5' -> vis_id 'video123' (reference
    ``data_provider.py:686-688``)."""
    return cap_id.split("#", 1)[0]


def read_video_set(path: str) -> List[str]:
    with open(path, "r") as fh:
        return [line.strip().split()[0] for line in fh if line.strip()]
