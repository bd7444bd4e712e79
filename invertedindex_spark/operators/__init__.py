from . import (chunking, decontaminate, dedup, events, maxscore,
               multimodal, packing, pipeline, report, similarity,
               textstats)
from .build import IndexConfig, build_index, read_manifest
from .query import InvertedIndex, queue_topk_np

__all__ = [
    "IndexConfig", "build_index", "read_manifest",
    "InvertedIndex", "queue_topk_np",
    "chunking", "decontaminate", "dedup", "events", "maxscore",
    "multimodal", "packing", "pipeline", "report", "similarity",
    "textstats",
]
