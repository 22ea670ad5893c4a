"""Large-scale training-data pipeline operators (the beyond-reference
mandate): text analysis, deduplication, embedding similarity search,
benchmark decontamination / sampling / packing / chunking pipelines,
multimodal column plumbing."""

from . import (classify, dedup, embed, graph, multimodal,
               pipeline, similarity, text, tokenize)

__all__ = ["text", "dedup", "graph", "similarity", "multimodal",
           "pipeline", "embed", "tokenize", "classify"]
