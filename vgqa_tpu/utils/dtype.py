"""Precision policy helpers.

The grounding model trains with float32 master weights; serving casts
weights + activations to ``TPU.COMPUTE_DTYPE`` (bfloat16 by default) so
matmuls/convs run at the MXU's native width. Loss/postprocess math upcasts
to float32 internally regardless.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve_dtype(name: str):
    return _DTYPES[name]


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype``."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)
