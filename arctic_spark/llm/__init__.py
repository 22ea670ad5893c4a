"""Large-scale training-data pipeline operators (the beyond-reference
mandate): text analysis, deduplication, embedding similarity search,
multimodal column plumbing."""

from . import dedup, graph, multimodal, similarity, text

__all__ = ["text", "dedup", "graph", "similarity", "multimodal"]
