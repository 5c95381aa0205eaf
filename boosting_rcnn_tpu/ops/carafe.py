"""CARAFE: content-aware reassembly of features (reference
``mmcv.ops.carafe`` as used by ``mmdet/models/necks/fpn_carafe.py``).

The CUDA kernel reassembles each upsampled pixel from a ``k_up x k_up``
window of the source feature map weighted by a predicted, softmax-normalised
kernel.  TPU-native form: extract all windows once with
``conv_general_dilated_patches`` (a regular im2col the MXU pipeline
handles), nearest-upsample the patch tensor, and contract against the
kernel field with one einsum — no scatter, fixed shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["carafe"]


def carafe(x: jnp.ndarray, masks: jnp.ndarray, k_up: int,
           scale: int) -> jnp.ndarray:
    """x: (B, H, W, C); masks: (B, H*scale, W*scale, k_up*k_up) normalised
    reassembly kernels -> (B, H*scale, W*scale, C)."""
    b, h, w, c = x.shape
    k2 = k_up * k_up
    # (B, H, W, C*k2): for output pixel p, the k_up^2 neighbourhood of its
    # source pixel (same-centre window, zero padded)
    pad = (k_up - 1) // 2
    patches = lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2),  # NCHW in, patches expects channel-major
        filter_shape=(k_up, k_up),
        window_strides=(1, 1),
        padding=[(pad, k_up - 1 - pad), (pad, k_up - 1 - pad)],
    )  # (B, C*k2, H, W), ordered [c, ky, kx]
    patches = patches.reshape(b, c, k2, h, w)
    # nearest x scale in both spatial dims
    patches = jnp.repeat(jnp.repeat(patches, scale, axis=3), scale, axis=4)
    out = jnp.einsum("bckhw,bhwk->bhwc", patches,
                     masks.astype(patches.dtype))
    return out


def normalize_masks(raw: jnp.ndarray) -> jnp.ndarray:
    """softmax over the kernel axis (mmcv CARAFE normalises per pixel)."""
    return jax.nn.softmax(raw.astype(jnp.float32), axis=-1)
