"""Per-sample 2D filtering (the OTF blur op).

Counterpart of the reference's filter2D
(/root/reference/neosr/utils/diffjpeg.py:558-584): each batch element is
convolved with its own kxk kernel, reflect padding.  Expressed as a single
grouped convolution with batch folded into the channel axis, which XLA maps
onto one fused depthwise conv instead of B separate launches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """img: (B,H,W,C); kernel: (B,k,k) per-sample. Reflect padding, SAME."""
    b, h, w, c = img.shape
    k = kernel.shape[-1]
    pad = k // 2
    x = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # fold batch into channels: (1, H+2p, W+2p, B*C)
    x = x.transpose(1, 2, 0, 3).reshape(1, h + 2 * pad, w + 2 * pad, b * c)
    # kernels: (k, k, B*C) -> HWIO (k, k, 1, B*C) wait: feature_group_count
    # needs kernel (k, k, in/groups=1, out=B*C)
    kern = jnp.repeat(kernel[:, None, :, :], c, axis=1)  # (B, C, k, k)
    kern = kern.reshape(b * c, k, k).transpose(1, 2, 0)[:, :, None, :]
    out = jax.lax.conv_general_dilated(
        x, kern.astype(img.dtype), (1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
    )
    return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)
