"""Arch zoo shape tests: every registered generator maps NHWC LQ -> NHWC SR
at the right scale, under jit, with tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# (type, extra opts, scale) — kept tiny for the 1-core CPU test env
CONV_ARCHS = [
    ("compact", {"num_feat": 16, "num_conv": 2}, 4),
    ("compact", {"num_feat": 16, "num_conv": 2}, 2),
    ("esrgan", {"num_feat": 16, "num_block": 1, "num_grow_ch": 8}, 4),
    ("esrgan", {"num_feat": 16, "num_block": 1, "num_grow_ch": 8}, 2),
    ("span", {"feature_channels": 16}, 4),
    ("plksr", {"dim": 16, "n_blocks": 2}, 4),
    ("plksr_tiny", {"dim": 16}, 4),
    ("plksr", {"dim": 16, "n_blocks": 1, "lk_type": "SparsePLK"}, 4),
    ("plksr", {"dim": 16, "n_blocks": 1, "lk_type": "RectSparsePLK"}, 4),
    ("realplksr", {"dim": 16, "n_blocks": 2}, 4),
    ("realplksr", {"dim": 16, "n_blocks": 1, "dysample": True}, 4),
    ("realplksr_s", {"dim": 16}, 4),
    ("man", {"n_feats": 12, "n_resblocks": 1}, 4),
    ("mosr_t", {}, 4),
    ("mosr", {"dim": 16, "n_block": 1, "upsampler": "ps"}, 4),
    ("mosr", {"dim": 16, "n_block": 1, "upsampler": "gps"}, 4),
    ("mosr", {"dim": 16, "n_block": 1, "upsampler": "dys"}, 4),
    ("safmn", {"dim": 16, "n_blocks": 1}, 4),
    ("light_safmnpp", {"dim": 16, "n_blocks": 1}, 4),
    ("spanplus", {"feature_channels": 16, "blocks": [1]}, 4),
    ("spanplus_sts", {}, 4),
    ("cugan", {}, 2),
    ("cugan", {}, 4),
    ("eimn", {"embed_dims": 16, "num_stages": 2}, 4),
    ("ditn", {"dim": 16, "ITL_blocks": 1, "SAL_blocks": 1}, 4),
    ("dctlsa", {"nf": 20, "num_modules": 2, "num_head": 4}, 4),
    ("msdan", {"channels": 16, "num_DFEB": 1}, 4),
]


@pytest.mark.parametrize("name,opts,scale", CONV_ARCHS)
def test_arch_forward(name, opts, scale):
    from neosr_tpu.archs import build_network

    net = build_network({"type": name, **opts}, scale=scale)
    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3)), jnp.float32)
    params = jax.jit(net.init)(jax.random.key(0), x)
    y = jax.jit(lambda p, v: net.apply(p, v))(params, x)
    assert y.shape == (1, 16 * scale, 16 * scale, 3), f"{name}: {y.shape}"
    assert np.isfinite(np.asarray(y)).all()


def test_esrgan_dense_block_custom_vjp_grads():
    """The MXU-packed dense block uses a custom VJP (wide-lane input and
    weight grads); its gradients must match autodiff of the textbook
    concat formulation exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neosr_tpu.archs.esrgan import _dense_block

    c, g = 16, 8
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, c)).astype(np.float32))
    ins = [c, c + g, c + 2 * g, c + 3 * g, c + 4 * g]
    outs = [g, g, g, g, c]
    Ws = tuple(
        jnp.asarray(rng.normal(0, 0.1, (3, 3, ins[k], outs[k])).astype(np.float32))
        for k in range(5)
    )
    bs = tuple(
        jnp.asarray(rng.normal(0, 0.1, (outs[k],)).astype(np.float32))
        for k in range(5)
    )

    def conv(xx, w):
        return jax.lax.conv_general_dilated(
            xx, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def naive(Ws, bs, x):
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        x1 = lrelu(conv(x, Ws[0]) + bs[0])
        x2 = lrelu(conv(jnp.concatenate([x, x1], -1), Ws[1]) + bs[1])
        x3 = lrelu(conv(jnp.concatenate([x, x1, x2], -1), Ws[2]) + bs[2])
        x4 = lrelu(conv(jnp.concatenate([x, x1, x2, x3], -1), Ws[3]) + bs[3])
        return conv(jnp.concatenate([x, x1, x2, x3, x4], -1), Ws[4]) + bs[4]

    cot = jnp.asarray(rng.normal(size=(2, 6, 6, c)).astype(np.float32))

    out_p = _dense_block(Ws, bs, x, c, g, jnp.float32)
    out_n = naive(Ws, bs, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_n),
                               atol=1e-5, rtol=1e-5)

    def loss_p(Ws, bs, x):
        return (_dense_block(Ws, bs, x, c, g, jnp.float32) * cot).sum()

    def loss_n(Ws, bs, x):
        return (naive(Ws, bs, x) * cot).sum()

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(Ws, bs, x)
    gn = jax.jit(jax.grad(loss_n, argnums=(0, 1, 2)))(Ws, bs, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gn), strict=True):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_window_attention_bf16_logits_lever(monkeypatch):
    """The bf16-logits path (+7.9% measured on swinir_medium, BENCH_NOTES
    round 3; quality-validated by the round-4 swinir anchor A/B) must stay
    within bf16 tolerance of the fp32-logits path.  Default is AUTO: f32
    inputs (parity/export paths) keep f32 logits; bf16 inputs (use_amp
    training — the validated condition) engage bf16 logits."""
    from neosr_tpu.archs.swin_util import window_attention

    rng = np.random.default_rng(7)
    b_, h, n, d = 4, 6, 64, 24
    q = jnp.asarray(rng.normal(size=(b_, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b_, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b_, h, n, d)).astype(np.float32))
    base = np.asarray(window_attention(q, k, v))
    monkeypatch.setenv("NEOSR_ATTN_LOGITS", "bf16")
    alt = np.asarray(window_attention(q, k, v))
    monkeypatch.delenv("NEOSR_ATTN_LOGITS")
    assert np.max(np.abs(alt - base)) < 0.05, np.max(np.abs(alt - base))
    # auto on f32 inputs == the f32 path exactly
    auto = np.asarray(window_attention(q, k, v))
    np.testing.assert_array_equal(auto, base)

    # auto on bf16 inputs == the forced-bf16 path exactly (lever engaged)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    auto_b = np.asarray(window_attention(qb, kb, vb).astype(jnp.float32))
    monkeypatch.setenv("NEOSR_ATTN_LOGITS", "bf16")
    forced_b = np.asarray(window_attention(qb, kb, vb).astype(jnp.float32))
    monkeypatch.setenv("NEOSR_ATTN_LOGITS", "f32")
    f32_b = np.asarray(window_attention(qb, kb, vb).astype(jnp.float32))
    monkeypatch.delenv("NEOSR_ATTN_LOGITS")
    np.testing.assert_array_equal(auto_b, forced_b)
    assert np.max(np.abs(auto_b - f32_b)) < 0.05


def test_bilinear_up2_formulations_match(monkeypatch):
    """All three _bilinear_up2 variants (gather / elementwise shifts /
    MXU einsum) compute identical half-pixel bilinear 2x upsampling."""
    import jax.numpy as jnp
    import numpy as np

    from neosr_tpu.archs import discriminators as D

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, 5, 3)).astype(np.float32))

    outs = {}
    for mode in ("gather", "elementwise", "einsum"):
        monkeypatch.setenv("NEOSR_D_RESIZE", mode)
        outs[mode] = np.asarray(D._bilinear_up2(x))
        assert outs[mode].shape == (2, 14, 10, 3)
    np.testing.assert_allclose(outs["elementwise"], outs["gather"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(outs["einsum"], outs["gather"],
                               rtol=1e-6, atol=1e-6)


def test_esrgan_phase_upconv_parity(monkeypatch):
    """NEOSR_UPCONV=phase computes the tail conv3x3(nearest_upsample(x,2))
    as ONE LR conv with 4 phase kernels + pixel_shuffle (arch_util.
    phase_upconv2x) — same params (checkpoint layout pinned), same math
    including the zero-pad boundary, on odd widths too."""
    import os

    import jax

    from neosr_tpu.archs import build_network

    x = jnp.asarray(np.random.default_rng(5).random((2, 12, 10, 3)), jnp.float32)
    net = build_network({"type": "esrgan", "num_block": 2}, scale=4)
    monkeypatch.delenv("NEOSR_UPCONV", raising=False)
    p = net.init(jax.random.key(0), x)
    y0 = net.apply(p, x)
    monkeypatch.setenv("NEOSR_UPCONV", "phase")
    p2 = net.init(jax.random.key(0), x)
    assert jax.tree.map(lambda a: a.shape, p) == jax.tree.map(lambda a: a.shape, p2)
    y1 = net.apply(p, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
