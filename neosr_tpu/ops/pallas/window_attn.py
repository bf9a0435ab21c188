"""Fused window-attention Pallas kernel (TPU).

The SwinIR-family hot op (SURVEY.md §3.5): per (window, head),
softmax(q k^T / sqrt(d) + bias [+ mask]) v over N = w^2 tokens.  XLA
materializes the (G, N, N) score tensor in HBM between the two matmuls;
this kernel keeps scores in VMEM — one HBM round trip instead of three.

Layout: windows are b-major / window-minor exactly as produced by
swin_util.window_partition, so the grid is (batch, nW, heads) and the mask
block is indexed by the window coordinate directly.  Forward is the Pallas
kernel; backward (custom_vjp) recomputes attention with XLA einsums —
training still benefits from the fused forward, and the backward stays
autodiff-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
    """One program handles TILE_W windows of one head as a batched matmul."""
    q = q_ref[0].astype(jnp.float32)          # (TILE_W, N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                          # (TILE_W, N, N)
    s = s + bias_ref[:].astype(jnp.float32)[None]
    if mask_ref is not None:
        s = s + mask_ref[:].astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _forward(q, k, v, bias, mask, nw: int, interpret: bool):
    """q,k,v: (B_, H, N, D) with B_ = batch * nW (window-minor); bias
    (H, N, N); mask (nW, N, N) or None.  Returns (B_, H, N, D)."""
    b_, h, n, d = q.shape
    batch = b_ // nw
    # windows per program: target ~512 score rows per batched matmul
    tile_w = max(1, min(nw, 512 // n))
    while nw % tile_w != 0:
        tile_w -= 1
    n_tiles = nw // tile_w

    # layout (batch, h, nW, N, D): head-major so one program's windows are
    # contiguous and the mask tile aligns with the window tile
    qg = q.reshape(batch, nw, h, n, d).transpose(0, 2, 1, 3, 4)
    kg = k.reshape(batch, nw, h, n, d).transpose(0, 2, 1, 3, 4)
    vg = v.reshape(batch, nw, h, n, d).transpose(0, 2, 1, 3, 4)

    grid = (batch, h, n_tiles)
    qkv_spec = pl.BlockSpec(
        (1, None, tile_w, n, d), lambda b, hh, w: (b, hh, w, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bias_spec = pl.BlockSpec(
        (None, n, n), lambda b, hh, w: (hh, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [qg, kg, vg, bias]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((tile_w, n, n), lambda b, hh, w: (w, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask)
        kernel = _attn_kernel
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):  # no-mask variant
            _attn_kernel(q_ref, k_ref, v_ref, bias_ref, None, o_ref)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, None, tile_w, n, d), lambda b, hh, w: (b, hh, w, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, h, nw, n, d), q.dtype),
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1, 3, 4).reshape(b_, h, n, d)


def _reference(q, k, v, bias, mask, nw: int):
    """XLA einsum reference (also the backward recomputation path)."""
    b_, h, n, d = q.shape
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        s = s.reshape(b_ // nw, nw, h, n, n) + mask[None, :, None].astype(jnp.float32)
        s = s.reshape(b_, h, n, n)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def window_attention_fused(q, k, v, bias, mask, nw: int, interpret: bool = False):
    """Fused scaled-window attention.  Pre-scale q before calling."""
    return _forward(q, k, v, bias, mask, nw, interpret)


def _fwd(q, k, v, bias, mask, nw, interpret):
    out = _forward(q, k, v, bias, mask, nw, interpret)
    return out, (q, k, v, bias, mask)


def _bwd(nw, interpret, res, g):
    q, k, v, bias, mask = res
    b_, h, n, d = q.shape
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        s = s.reshape(b_ // nw, nw, h, n, n) + mask[None, :, None].astype(jnp.float32)
        s = s.reshape(b_, h, n, n)
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, vf)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf).astype(v.dtype)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(jnp.float32)).astype(k.dtype)
    dbias = jnp.sum(ds, axis=0).astype(bias.dtype)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dbias, dmask


window_attention_fused.defvjp(_fwd, _bwd)
