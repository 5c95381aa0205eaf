"""Corner pooling (reference mmcv ``CornerPool``, used by
``mmdet/models/dense_heads/corner_head.py:8``).

top_pool[i, j]    = max over i' >= i of x[i', j]   (scan bottom -> top)
bottom_pool[i, j] = max over i' <= i of x[i', j]
left_pool         = max over j' >= j
right_pool        = max over j' <= j

On TPU these are reversed/forward cumulative maxima — one
``lax.cummax`` each, no custom kernel."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def top_pool(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C): max over rows below (inclusive)."""
    return jnp.flip(
        jax.lax.cummax(jnp.flip(x, axis=-3), axis=x.ndim - 3), axis=-3
    )


def bottom_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.cummax(x, axis=x.ndim - 3)


def left_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.flip(
        jax.lax.cummax(jnp.flip(x, axis=-2), axis=x.ndim - 2), axis=-2
    )


def right_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.cummax(x, axis=x.ndim - 2)
