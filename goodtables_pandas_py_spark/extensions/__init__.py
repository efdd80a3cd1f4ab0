"""Extension operators beyond the reference (SURVEY.md §2.9 X1-X6):
large-scale training-data-pipeline operations — dedup, similarity
search, text analysis, multimodal columns. All DataFrame-first; Python
only where genuinely needed (and then Arrow-batched)."""

from . import dedup, multimodal, pipeline, similarity, text

__all__ = ["dedup", "multimodal", "pipeline", "similarity", "text"]
