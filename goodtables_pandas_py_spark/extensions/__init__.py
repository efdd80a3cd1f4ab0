"""Extension operators beyond the reference (SURVEY.md §2.9 X1-X7):
large-scale training-data-pipeline operations — dedup, similarity
search, text analysis, multimodal columns, dataset splitting /
sequence packing. All DataFrame-first; Python only where genuinely
needed (and then Arrow-batched)."""

from . import (
    decontam,
    dedup,
    dsir,
    multimodal,
    pipeline,
    profiling,
    similarity,
    spans,
    splits,
    takedown,
    temporal,
    text,
    web,
)

__all__ = [
    "decontam", "dedup", "dsir", "multimodal", "pipeline", "profiling",
    "similarity", "spans", "splits", "takedown", "temporal", "text",
    "web",
]
