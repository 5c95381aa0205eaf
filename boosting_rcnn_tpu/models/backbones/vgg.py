"""SSD-VGG16 backbone (spec: reference ``mmdet/models/backbones/ssd_vgg.py``):
VGG-16 conv stack with ceil-mode pools, dilated fc6/fc7 convs, L2Norm on the
conv4_3 output, and the SSD extra-layer pyramid."""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

VGG16_CFG = [
    (2, 64),  # conv1
    (2, 128),  # conv2
    (3, 256),  # conv3
    (3, 512),  # conv4  <- out (L2-normed)
    (3, 512),  # conv5
]


class L2Norm(nn.Module):
    """Channel-wise L2 normalisation with a learnable per-channel scale
    (init 20), applied to conv4_3 (reference ``ssd_vgg.py`` L2Norm)."""

    scale_init: float = 20.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.param(
            "scale", nn.initializers.constant(self.scale_init), (c,), jnp.float32
        )
        norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-10)
        return (x / norm * g).astype(x.dtype)


def _ceil_pool(x, k=2, s=2):
    # SAME padding gives ceil-mode pooling for even dims; VGG input 300
    # produces the canonical 38x38 conv4_3 with this scheme
    return nn.max_pool(x, (k, k), strides=(s, s), padding="SAME")


class SSDVGG(nn.Module):
    """Returns 6 feature maps (conv4_3 L2-normed, conv7, extras x4)."""

    out_feature_indices: Tuple[int, ...] = (3, 4)
    extra_channels: Tuple[Tuple[int, int, int], ...] = (
        # (mid, out, stride): conv8..conv11
        (256, 512, 2),
        (128, 256, 2),
        (128, 256, 1),
        (128, 256, 1),
    )
    # final stride-1 extra conv kernel: 3 (VALID, ssd300) or 4 pad 1
    # (ssd512, reference SSDNeck last_kernel_size=4)
    last_kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for stage, (n_convs, ch) in enumerate(VGG16_CFG):
            for i in range(n_convs):
                x = nn.Conv(
                    ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name=f"conv{stage+1}_{i+1}",
                )(x)
                x = nn.relu(x)
            if stage == 3:
                outs.append(L2Norm(dtype=self.dtype, name="l2norm")(x))
            if stage < 4:
                x = _ceil_pool(x)
        # pool5: 3x3 stride 1
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        # fc6 (dilated) + fc7
        x = nn.Conv(
            1024, (3, 3), padding=[(6, 6), (6, 6)], kernel_dilation=(6, 6),
            dtype=self.dtype, name="conv6",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(1024, (1, 1), dtype=self.dtype, name="conv7")(x)
        x = nn.relu(x)
        outs.append(x)
        # extras
        for i, (mid, out, stride) in enumerate(self.extra_channels):
            x = nn.Conv(mid, (1, 1), dtype=self.dtype, name=f"extra{i}_1")(x)
            x = nn.relu(x)
            if stride == 2:
                x = nn.Conv(
                    out, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f"extra{i}_2",
                )(x)
            else:
                k = (self.last_kernel_size
                     if i == len(self.extra_channels) - 1 else 3)
                x = nn.Conv(
                    out, (k, k),
                    padding=([(1, 1), (1, 1)] if k == 4 else "VALID"),
                    dtype=self.dtype, name=f"extra{i}_2",
                )(x)
            x = nn.relu(x)
            outs.append(x)
        return tuple(outs)
