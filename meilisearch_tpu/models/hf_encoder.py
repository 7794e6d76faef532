"""In-process text embedding on TPU.

Reference behavior: milli vector/embedder/hf.rs — a BERT-family checkpoint
pulled from the hub, tokenized, mean/CLS-pooled, optionally L2-normalized;
used for both indexing-time document embeddings and search-time query
embeddings (LRU-cached upstream).

TPU-native path: transformers' Flax models under `jax.jit`, so document
batches embed as one XLA program on the MXU; torch-cpu is the fallback when
a checkpoint has no Flax weights. Zero-egress deployments can point
`model` at a local path.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np


class FlaxTextEncoder:
    def __init__(
        self,
        model_name: str,
        pooling: str = "useModel",  # useModel|forceMean|forceCls
        max_len: int = 512,
    ):
        self.model_name = model_name
        self.pooling = pooling
        self.max_len = max_len
        self._flax = None
        self._torch = None
        self._tokenizer = None
        self._jitted = None

    def _load(self):
        if self._tokenizer is not None:
            return
        from transformers import AutoTokenizer

        self._tokenizer = AutoTokenizer.from_pretrained(self.model_name)
        try:
            from transformers import FlaxAutoModel

            self._flax = FlaxAutoModel.from_pretrained(self.model_name)
            import jax

            def forward(params, input_ids, attention_mask):
                out = self._flax.module.apply(
                    {"params": params},
                    input_ids,
                    attention_mask,
                )
                hidden = out.last_hidden_state
                if self.pooling == "forceCls":
                    return hidden[:, 0]
                mask = attention_mask[:, :, None].astype(hidden.dtype)
                return (hidden * mask).sum(1) / mask.sum(1).clip(1e-9)

            self._jitted = jax.jit(forward)
        except Exception:
            # no Flax weights for this checkpoint: torch-cpu fallback
            from transformers import AutoModel

            self._torch = AutoModel.from_pretrained(self.model_name)
            self._torch.eval()

    def encode(self, texts: list[str], normalize: bool = True) -> np.ndarray:
        self._load()
        tok = self._tokenizer(
            texts,
            return_tensors="np" if self._flax is not None else "pt",
            padding=True,
            truncation=True,
            max_length=self.max_len,
        )
        if self._flax is not None:
            emb = np.asarray(
                self._jitted(
                    self._flax.params, tok["input_ids"], tok["attention_mask"]
                )
            )
        else:
            import torch

            with torch.no_grad():
                out = self._torch(**tok)
                hidden = out.last_hidden_state
                if self.pooling == "forceCls":
                    emb = hidden[:, 0].numpy()
                else:
                    mask = tok["attention_mask"][:, :, None].to(hidden.dtype)
                    emb = ((hidden * mask).sum(1) / mask.sum(1).clamp(1e-9)).numpy()
        emb = emb.astype(np.float32)
        if normalize:
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            emb = emb / norms
        return emb


@lru_cache(maxsize=4)
def _encoder(model_name: str, pooling: str) -> FlaxTextEncoder:
    return FlaxTextEncoder(model_name, pooling)


def encode_text(
    model_name: str, text: str, pooling: str = "useModel"
) -> Optional[np.ndarray]:
    return _encoder(model_name, pooling).encode([text])[0]
