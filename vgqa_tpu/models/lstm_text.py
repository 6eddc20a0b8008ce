"""GloVe + LSTM text encoder (flax).

Working re-design of the reference ``RNNEncoder``
(/root/reference/vgqa/core/language/lstm.py:11-90). The reference's selector
can never build it — ``cfg.MODE.LSTM`` typo at language/__init__.py:11 — and
its torch path relies on pack_padded_sequence sorting. Here the LSTM scans
the padded [V, L] batch directly and the mask picks each sequence's last
valid state — same result, no sorting, fully jittable.

GloVe vectors load from a ``glove.npy`` + ``glove_vocab.json`` pair in
``GLOVE_DIR`` (converted offline); absent assets fall back to a trainable
embedding table.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def load_glove(glove_dir: str) -> Optional[Tuple[np.ndarray, dict]]:
    vec_path = os.path.join(glove_dir, "glove.npy")
    vocab_path = os.path.join(glove_dir, "glove_vocab.json")
    if not (os.path.exists(vec_path) and os.path.exists(vocab_path)):
        return None
    vectors = np.load(vec_path)
    with open(vocab_path) as f:
        vocab = json.load(f)
    return vectors, vocab


class LSTMTextEncoder(nn.Module):
    """Bidirectional LSTM over word embeddings; returns per-token features
    and the last-valid-step output (the reference's sentence feature,
    lstm.py:70-74)."""

    hidden_size: int = 256            # per direction
    embed_dim: int = 300
    vocab_size: int = 400002
    num_layers: int = 2
    bidirectional: bool = True
    pretrained_vectors: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray, mask: jnp.ndarray):
        """token_ids [V, L] int32, mask [V, L] bool.

        Returns (tokens [V, L, D_out], sentence [V, D_out]) where
        D_out = hidden * num_dirs."""
        if self.pretrained_vectors is not None:
            table = self.param(
                "embedding",
                lambda rng: jnp.asarray(self.pretrained_vectors, jnp.float32),
            )
        else:
            table = self.param(
                "embedding",
                nn.initializers.normal(0.02),
                (self.vocab_size, self.embed_dim),
            )
        ids = jnp.clip(token_ids, 0, table.shape[0] - 1)
        x = jax.lax.stop_gradient(table)[ids]  # GloVe frozen (lstm.py:26)

        lengths = mask.sum(axis=1).astype(jnp.int32)

        for layer in range(self.num_layers):
            fwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size),
                name=f"lstm_fwd_{layer}",
            )(x, seq_lengths=lengths)
            if self.bidirectional:
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(self.hidden_size),
                    reverse=True, keep_order=True,
                    name=f"lstm_bwd_{layer}",
                )(x, seq_lengths=lengths)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd

        # last valid step per sequence
        idx = jnp.maximum(lengths - 1, 0)
        sentence = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
        return x, sentence


class LSTMTextTower(nn.Module):
    """LSTM encoder + projection to the grounding model's hidden size —
    drop-in for TextEncoder's (tokens, cls) interface."""

    out_dim: int = 256
    hidden_size: int = 256
    vocab_size: int = 400002
    num_layers: int = 2
    bidirectional: bool = True
    pretrained_vectors: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, token_ids, mask, deterministic=True):
        tokens, sentence = LSTMTextEncoder(
            self.hidden_size // (2 if self.bidirectional else 1),
            vocab_size=self.vocab_size,
            num_layers=self.num_layers,
            bidirectional=self.bidirectional,
            pretrained_vectors=self.pretrained_vectors,
            name="rnn",
        )(token_ids, mask)
        proj = nn.Dense(self.out_dim, name="proj")
        return proj(tokens), proj(sentence)
