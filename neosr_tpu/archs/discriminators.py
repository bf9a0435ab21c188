"""Discriminators: Real-ESRGAN U-Net and pix2pixHD PatchGAN (spectral norm).

Capability parity with /root/reference/neosr/archs/unet_arch.py:9-67 and
patchgan_arch.py:34-146.  Spectral normalization matches torch's hook
implementation: persistent power-iteration vectors u/v live in the
"batch_stats" collection (the same mutable-collection threading BN running
stats already use through the train step / checkpoints / .pth interop).
A mutable apply runs ONE power iteration and stores the update; a
read-only apply normalizes by the stored estimate — exactly torch
`.eval()`, so imported reference net_d checkpoints reproduce.  A stateless
mode (cold-start power iteration each forward, no persistent state) is
kept for pure-function uses.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import to_2tuple
from neosr_tpu.utils.registry import ARCH_REGISTRY


def spectral_normalize(kernel: jnp.ndarray, n_iter: int = 3, eps: float = 1e-12) -> jnp.ndarray:
    """Divide an HWIO conv kernel by its spectral norm (power iteration)."""
    kh, kw, cin, cout = kernel.shape
    w = kernel.reshape(-1, cout).astype(jnp.float32)  # (kh*kw*cin, cout)
    u = jnp.ones((cout,), jnp.float32) / jnp.sqrt(cout)

    def body(_, u):
        v = w @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u = w.T @ v
        u = u / (jnp.linalg.norm(u) + eps)
        return u

    u = jax.lax.fori_loop(0, n_iter, body, u)
    v = w @ u
    sigma = jnp.linalg.norm(v)
    return (kernel / jnp.maximum(sigma, eps)).astype(kernel.dtype)


class SNConv(nn.Module):
    """Conv2d with spectral normalization.

    stateful (default): torch-parity persistent u/v (see module docstring).
    The kernel is stored HWIO; torch's weight_mat is the OIHW reshape
    (cout, cin*kh*kw), so our (kh*kw*cin, cout) reshape is its transpose
    up to a row permutation — u maps 1:1, v needs the (cin,kh,kw) ->
    (kh,kw,cin) reorder handled by the .pth converters.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    stateful: bool = True
    n_iter: int = 3  # stateless mode only

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = to_2tuple(self.kernel_size)
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (*ks, cin, self.features),
            jnp.float32,
        )
        if self.stateful:
            eps = 1e-12
            m = kernel.reshape(-1, self.features).astype(jnp.float32)

            def _init_uv():
                # one deterministic iteration from a fixed start (torch
                # draws u,v ~ N(0,1) then iterates on first forward)
                u0 = jnp.ones((self.features,), jnp.float32) / jnp.sqrt(self.features)
                v0 = m @ u0
                v0 = v0 / (jnp.linalg.norm(v0) + eps)
                u1 = m.T @ v0
                return u1 / (jnp.linalg.norm(u1) + eps), v0

            u_var = self.variable("batch_stats", "u", lambda: _init_uv()[0])
            v_var = self.variable("batch_stats", "v", lambda: _init_uv()[1])
            updating = (not self.is_initializing()
                        and self.is_mutable_collection("batch_stats"))
            if updating:
                # torch SpectralNorm.compute_weight: iterate under no_grad
                # (v from current u, then u), store, THEN sigma w/ graph
                v_new = jax.lax.stop_gradient(m) @ u_var.value
                v_new = v_new / (jnp.linalg.norm(v_new) + eps)
                u_new = jax.lax.stop_gradient(m).T @ v_new
                u_new = u_new / (jnp.linalg.norm(u_new) + eps)
                u_var.value, v_var.value = u_new, v_new
                u, v = u_new, v_new
            else:
                u, v = u_var.value, v_var.value
            sigma = (m @ u) @ v
            kernel = (kernel / jnp.maximum(sigma, eps)).astype(kernel.dtype)
        else:
            kernel = spectral_normalize(kernel, self.n_iter)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            to_2tuple(self.strides),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out


def _lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def _bilinear_up2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample (half-pixel centers, edge clamp ==
    jax.image.resize "bilinear" == torch F.interpolate align_corners=False).

    Two formulations, identical math (parity-tested):
    - gather: jax.image.resize — the DEFAULT.  Measured 117.6 p/s on the
      fused OTF+GAN bench vs 106-107 for the shifts+interleave form: the
      concat/stack/reshape chain breaks XLA's conv fusions around it and
      costs more than the gather it saves (BENCH_NOTES round 3).
    - elementwise (NEOSR_D_RESIZE=elementwise): out[2i] = .25 x[i-1] +
      .75 x[i], out[2i+1] = .75 x[i] + .25 x[i+1] via shifts+interleave;
      kept as an A/B lever for other topologies/generations.
    - einsum (NEOSR_D_RESIZE=einsum): separable interpolation MATRICES
      (2H,H)/(2W,W) contracted on the MXU — upsampling as two small
      matmuls instead of a vector-unit gather.  The matrices are trace-time
      numpy constants (2 nonzeros/row), so XLA sees plain dots it can fuse.
    """
    import os
    mode = os.environ.get("NEOSR_D_RESIZE", "gather")
    if mode == "einsum":
        def up_mat(n: int) -> jnp.ndarray:
            import numpy as _np

            m = _np.zeros((2 * n, n), _np.float32)
            for i in range(n):
                m[2 * i, max(i - 1, 0)] += 0.25
                m[2 * i, i] += 0.75
                m[2 * i + 1, i] += 0.75
                m[2 * i + 1, min(i + 1, n - 1)] += 0.25
            return jnp.asarray(m, x.dtype)

        y = jnp.einsum("Oh,bhwc->bOwc", up_mat(x.shape[1]), x)
        return jnp.einsum("Ow,bhwc->bhOc", up_mat(x.shape[2]), y)
    if mode != "elementwise":
        return jax.image.resize(
            x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
            method="bilinear")

    def up_axis(v: jnp.ndarray, axis: int) -> jnp.ndarray:
        first = jax.lax.slice_in_dim(v, 0, 1, axis=axis)
        last = jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis], axis=axis)
        prev = jnp.concatenate(
            [first, jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)], axis
        )
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis), last], axis
        )
        a = 0.25 * prev + 0.75 * v
        b = 0.75 * v + 0.25 * nxt
        st = jnp.stack([a, b], axis=axis + 1)
        shape = list(v.shape)
        shape[axis] *= 2
        return st.reshape(shape)

    return up_axis(up_axis(x, 1), 2)


@ARCH_REGISTRY.register()
class unet(nn.Module):
    """U-Net discriminator with SN (Real-ESRGAN); outputs a 1-ch logit map."""

    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nf = self.num_feat
        x0 = _lrelu(nn.Conv(nf, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32)(x))
        x1 = _lrelu(SNConv(nf * 2, 4, 2, 1, use_bias=False, dtype=self.dtype)(x0))
        x2 = _lrelu(SNConv(nf * 4, 4, 2, 1, use_bias=False, dtype=self.dtype)(x1))
        x3 = _lrelu(SNConv(nf * 8, 4, 2, 1, use_bias=False, dtype=self.dtype)(x2))

        x3 = _bilinear_up2(x3)
        x4 = _lrelu(SNConv(nf * 4, 3, 1, 1, use_bias=False, dtype=self.dtype)(x3))
        if self.skip_connection:
            x4 = x4 + x2
        x4 = _bilinear_up2(x4)
        x5 = _lrelu(SNConv(nf * 2, 3, 1, 1, use_bias=False, dtype=self.dtype)(x4))
        if self.skip_connection:
            x5 = x5 + x1
        x5 = _bilinear_up2(x5)
        x6 = _lrelu(SNConv(nf, 3, 1, 1, use_bias=False, dtype=self.dtype)(x5))
        if self.skip_connection:
            x6 = x6 + x0

        out = _lrelu(SNConv(nf, 3, 1, 1, use_bias=False, dtype=self.dtype)(x6))
        out = _lrelu(SNConv(nf, 3, 1, 1, use_bias=False, dtype=self.dtype)(out))
        return nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32)(out)


@ARCH_REGISTRY.register()
class patchgan(nn.Module):
    """pix2pixHD PatchGAN discriminator with SN."""

    num_in_ch: int = 3
    num_feat: int = 64
    num_layers: int = 3
    max_nf_mult: int = 8
    use_sigmoid: bool = False
    use_sn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def conv(features, stride, cur):
            if self.use_sn:
                return SNConv(features, 4, stride, 1, dtype=self.dtype)(cur)
            return nn.Conv(
                features, (4, 4), (stride, stride), padding=1,
                dtype=self.dtype, param_dtype=jnp.float32,
            )(cur)

        h = _lrelu(conv(self.num_feat, 2, x))
        nf_mult = 1
        for n in range(1, self.num_layers):
            nf_mult = min(2**n, self.max_nf_mult)
            h = _lrelu(conv(self.num_feat * nf_mult, 2, h))
        nf_mult = min(2**self.num_layers, self.max_nf_mult)
        h = _lrelu(conv(self.num_feat * nf_mult, 1, h))
        h = conv(1, 1, h)
        if self.use_sigmoid:
            h = jax.nn.sigmoid(h)
        return h
