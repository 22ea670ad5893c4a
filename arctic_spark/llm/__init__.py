"""Large-scale training-data pipeline operators (the beyond-reference
mandate): text analysis, deduplication, embedding similarity search,
benchmark decontamination / sampling / packing / chunking pipelines,
tokenizers (BPE + unigram-LM + WordPiece), n-gram language modeling, multimodal
column plumbing with real codecs."""

from . import (classify, dedup, embed, graph, jpeg, multimodal,
               ngram_lm, pipeline, similarity, text, tokenize,
               unigram, wordpiece)

__all__ = ["text", "dedup", "graph", "similarity", "multimodal",
           "pipeline", "embed", "tokenize", "classify", "unigram",
           "ngram_lm", "jpeg", "wordpiece"]
