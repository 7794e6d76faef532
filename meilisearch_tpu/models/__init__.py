"""Embedding model wrappers — the engine's "model families".

Reference: milli's huggingFace embedder runs candle BERT inference
in-process (vector/embedder/hf.rs); here local inference runs through JAX
(Flax checkpoints on TPU) with a torch-cpu fallback.
"""

from .hf_encoder import FlaxTextEncoder, encode_text

__all__ = ["FlaxTextEncoder", "encode_text"]
