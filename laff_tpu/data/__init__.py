from .sources import TextSource, VisionSource, read_video_set, vis_id_of
from .feed import (EvalFeed, PairFeed, Prefetcher, TextBatcher,
                   VisBatcher, host_cast_bf16)

__all__ = [
    "TextSource",
    "VisionSource",
    "read_video_set",
    "vis_id_of",
    "EvalFeed",
    "PairFeed",
    "Prefetcher",
    "TextBatcher",
    "VisBatcher",
    "host_cast_bf16",
]
