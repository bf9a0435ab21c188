"""Pallas fused window attention: forward + vjp parity (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np


def _inputs():
    rng = np.random.default_rng(0)
    batch, nw, h, n, d = 2, 4, 2, 64, 32
    b_ = batch * nw
    q = jnp.asarray(rng.standard_normal((b_, h, n, d)), jnp.float32) * 0.2
    k = jnp.asarray(rng.standard_normal((b_, h, n, d)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((b_, h, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, n, n)), jnp.float32) * 0.1
    mask = jnp.asarray(
        np.where(rng.random((nw, n, n)) < 0.1, -100.0, 0.0), jnp.float32
    )
    return q, k, v, bias, mask, nw


def test_fused_forward_parity():
    from neosr_tpu.ops.pallas.window_attn import _reference, window_attention_fused

    q, k, v, bias, mask, nw = _inputs()
    want = _reference(q, k, v, bias, mask, nw)
    got = window_attention_fused(q, k, v, bias, mask, nw, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # no-mask path
    want2 = _reference(q, k, v, bias, None, nw)
    got2 = window_attention_fused(q, k, v, bias, None, nw, True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-5)


def test_fused_vjp_parity():
    from neosr_tpu.ops.pallas.window_attn import _reference, window_attention_fused

    q, k, v, bias, mask, nw = _inputs()

    g1 = jax.grad(
        lambda *a: jnp.sum(window_attention_fused(*a, mask, nw, True) ** 2),
        argnums=(0, 1, 2, 3),
    )(q, k, v, bias)
    g2 = jax.grad(
        lambda *a: jnp.sum(_reference(*a, mask, nw) ** 2), argnums=(0, 1, 2, 3)
    )(q, k, v, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
