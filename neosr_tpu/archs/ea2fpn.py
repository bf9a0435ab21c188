"""EA2-FPN discriminator (ResNet18 backbone + FPN + linear attention).

Behavioral parity with /root/reference/neosr/archs/ea2fpn_arch.py:214-309,
the default net_d in the reference templates: ResNet18 encoder, FPN with
DySample upsampling, segmentation heads, efficient (linear) attention
aggregation, spectral-normalized convs, Dropout2d, final DySample to a
3-channel map.

Deviations (documented): the reference loads ImageNet ResNet18 weights
(unavailable here — gated via trunk_weights_path like the VGG losses).
BatchNorm and spectral norm carry torch-matching persistent state in the
"batch_stats" collection (running statistics / power-iteration u,v).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import DySample
from neosr_tpu.archs.discriminators import SNConv
from neosr_tpu.utils.registry import ARCH_REGISTRY


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class BatchStatNorm(nn.Module):
    """BatchNorm with torch semantics: batch statistics + running-stat
    update in training, running statistics in eval (torch
    nn.BatchNorm2d; reference dat_arch.py:386-398, eimn_arch.py:204-264).

    The mode is inferred from the apply call, so intermediate modules need
    no train flag: `apply(..., mutable=["batch_stats"])` (the train step)
    normalizes by the current batch and folds the running-stat update into
    the returned collection; a plain `apply` (eval/inference) normalizes
    by the stored running statistics — exactly torch `.eval()`.  Running
    variance uses the unbiased estimator for the update and the biased one
    for normalization, matching torch.
    """

    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        use_batch = (
            self.is_mutable_collection("batch_stats") or self.is_initializing()
        )
        if use_batch:
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=(0, 1, 2))
            var = xf.var(axis=(0, 1, 2))
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps)
        return ((x - mean) * inv * scale + bias).astype(x.dtype)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=1,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = jax.nn.relu(BatchStatNorm(dtype=self.dtype)(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = BatchStatNorm(dtype=self.dtype)(y)
        if self.strides != 1 or residual.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32)(residual)
            residual = BatchStatNorm(dtype=self.dtype)(residual)
        return jax.nn.relu(y + residual)


class ResNet18Trunk(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # stem: conv7x7 s2 + bn + relu  -> c1 (H/2, 64)
        h = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        c1 = jax.nn.relu(BatchStatNorm(dtype=self.dtype)(h))
        # maxpool s2 + layer1 -> c2 (H/4, 64)
        h = jnp.pad(c1, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                  (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        c2 = BasicBlock(64, dtype=self.dtype)(BasicBlock(64, dtype=self.dtype)(h))
        c3 = BasicBlock(128, dtype=self.dtype)(
            BasicBlock(128, 2, dtype=self.dtype)(c2))
        c4 = BasicBlock(256, dtype=self.dtype)(
            BasicBlock(256, 2, dtype=self.dtype)(c3))
        c5 = BasicBlock(512, dtype=self.dtype)(
            BasicBlock(512, 2, dtype=self.dtype)(c4))
        return c1, c2, c3, c4, c5


class LinearAttention(nn.Module):
    """Efficient attention (ea2fpn_arch.py:98-140), linear in pixels."""

    in_places: int
    scale: int = 8
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        gamma = self.param("gamma", nn.initializers.zeros_init(), (1,))
        q = nn.Conv(c // self.scale, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(x).reshape(b, n, -1)
        k = nn.Conv(c // self.scale, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(x).reshape(b, n, -1)
        v = nn.Conv(c, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(x).reshape(b, n, c)

        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)

        tailor_sum = 1.0 / (
            n + jnp.einsum("bnc,bc->bn", q, k.sum(axis=1) + self.eps)
        )
        value_sum = v.sum(axis=1, keepdims=True)  # b, 1, c
        matrix = jnp.einsum("bnm,bnc->bmc", k, v)  # b, dk, c
        matrix_sum = value_sum + jnp.einsum("bnm,bmc->bnc", q, matrix)
        out = matrix_sum * tailor_sum[..., None]
        out = out.reshape(b, h, w, c)
        return gamma.astype(out.dtype) * out


class Conv3x3GNMish(nn.Module):
    out_channels: int
    upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = SNConv(self.out_channels, 3, 1, 1, use_bias=False, dtype=self.dtype)(x)
        # epsilon: torch nn.GroupNorm default (ea2fpn_arch.py:169)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(h)
        h = _mish(h)
        if self.upsample:
            h = DySample(64, 64, 2, groups=4, end_convolution=True,
                         dtype=self.dtype)(h)
        return h


@ARCH_REGISTRY.register()
class ea2fpn(nn.Module):
    class_num: int = 6
    pyramid_channels: int = 64
    segmentation_channels: int = 64
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        c1, c2, c3, c4, c5 = ResNet18Trunk(dtype=self.dtype)(x)

        p5 = SNConv(self.pyramid_channels, 1, 1, 0, dtype=self.dtype)(c5)

        def fpn_block(p, skip):
            p_up = DySample(64, 64, 2, groups=4, end_convolution=False,
                            dtype=self.dtype)(p)
            sk = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32)(skip)
            return p_up + sk

        p4 = fpn_block(p5, c4)
        p3 = fpn_block(p4, c3)
        p2 = fpn_block(p3, c2)

        def seg(p, n_up):
            h = Conv3x3GNMish(self.segmentation_channels, upsample=n_up > 0,
                              dtype=self.dtype)(p)
            for _ in range(1, n_up):
                h = Conv3x3GNMish(self.segmentation_channels, upsample=True,
                                  dtype=self.dtype)(h)
            return h

        s5 = seg(p5, 3)
        s4 = seg(p4, 2)
        s3 = seg(p3, 1)
        s2 = seg(p2, 0)

        fcat = jnp.concatenate([s5, s4, s3, s2], axis=-1)
        feat = SNConv(self.segmentation_channels * 4, 1, 1, 0, use_bias=False,
                      dtype=self.dtype)(fcat)
        feat = BatchStatNorm(dtype=self.dtype)(feat)
        feat = _mish(feat)
        atten = LinearAttention(self.segmentation_channels * 4,
                                dtype=self.dtype)(feat)
        out = atten + feat
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                             deterministic=deterministic)(out)
        out = SNConv(self.class_num, 1, 1, 0, dtype=self.dtype)(out)
        return DySample(self.class_num, 3, 4, groups=3, end_convolution=False,
                        dtype=self.dtype)(out)
