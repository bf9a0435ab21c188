"""Transformer arch zoo shape tests (tiny configs, jitted)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TRANSFORMER_ARCHS = [
    ("swinir", {"embed_dim": 24, "depths": [2, 2], "num_heads": [2, 2],
                "window_size": 8, "upsampler": "pixelshuffle"}, 4),
    ("swinir", {"embed_dim": 24, "depths": [2], "num_heads": [2],
                "window_size": 8, "upsampler": "pixelshuffledirect"}, 4),
    ("swinir", {"embed_dim": 24, "depths": [2], "num_heads": [2],
                "window_size": 8, "upsampler": "nearest+conv"}, 4),
    ("swinir", {"embed_dim": 24, "depths": [2], "num_heads": [2],
                "window_size": 8, "resi_connection": "3conv"}, 4),
    ("hat", {"embed_dim": 24, "depths": [2], "num_heads": [2],
             "window_size": 8, "squeeze_factor": 4, "mlp_ratio": 2.0}, 4),
    ("drct", {"embed_dim": 24, "depths": [1], "num_heads": [2],
              "window_size": 8, "gc": 8}, 4),
    ("atd", {"embed_dim": 24, "depths": [2], "num_heads": [2], "window_size": 8,
             "category_size": 32, "num_tokens": 16, "reducted_dim": 4}, 4),
    ("dat", {"embed_dim": 24, "depth": [4], "num_heads": [2],
             "split_size": [4, 8], "expansion_factor": 2.0}, 4),
    ("srformer", {"embed_dim": 24, "depths": [2], "num_heads": [2],
                  "window_size": 8}, 4),
    ("omnisr", {"num_feat": 16, "window_size": 8}, 4),
    ("grformer", {"embed_dim": 24, "depths": [4], "num_heads": [2],
                  "window_size": [4, 8]}, 4),
    ("rgt", {"embed_dim": 24, "depth": [4], "num_heads": [2],
             "split_size": [4, 8]}, 4),
    ("hit_srf", {"embed_dim": 20, "depths": [3], "num_heads": [2],
                 "base_win_size": [4, 4], "hier_win_ratios": [0.5, 1, 2]}, 4),
    ("hma", {"embed_dim": 24, "depths": [2], "num_heads": [2],
             "window_size": 8, "interval_size": 4}, 4),
    ("craft", {"embed_dim": 24, "depths": [1], "num_heads": [2],
               "split_size_0": 4, "split_size_1": 8}, 4),
]


@pytest.mark.parametrize("name,opts,scale", TRANSFORMER_ARCHS)
def test_transformer_forward(name, opts, scale):
    from neosr_tpu.archs import build_network

    net = build_network({"type": name, **opts}, scale=scale)
    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3)), jnp.float32)
    params = jax.jit(net.init)(jax.random.key(0), x)
    y = jax.jit(lambda p, v: net.apply(p, v))(params, x)
    assert y.shape == (1, 16 * scale, 16 * scale, 3), f"{name}: {y.shape}"
    assert np.isfinite(np.asarray(y)).all()


def test_shifted_window_mask_matches_swin_convention():
    from neosr_tpu.archs.swin_util import shift_attn_mask

    mask = shift_attn_mask(16, 16, 8, 4)
    assert mask.shape == (4, 64, 64)
    # the first (non-boundary) window must be unmasked
    assert (mask[0] == 0).all()
    # boundary windows must mask cross-region pairs
    assert (mask[-1] < 0).any()


def test_window_partition_roundtrip():
    from neosr_tpu.archs.swin_util import window_partition, window_reverse

    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 24, 5)), jnp.float32)
    w = window_partition(x, 8)
    assert w.shape == (2 * 2 * 3, 64, 5)
    back = window_reverse(w, 8, 16, 24)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_use_checkpoint_param_compatible():
    """use_checkpoint (remat) keeps the same param tree and forward output,
    so checkpoints are interchangeable (reference swinir/srformer/hitsrf/hma
    use_checkpoint flag)."""
    import jax
    import jax.numpy as jnp

    from neosr_tpu.archs import build_network

    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3), np.float32))
    a = build_network({"type": "swinir_small"}, scale=4)
    b = build_network({"type": "swinir_small", "use_checkpoint": True}, scale=4)
    p = jax.jit(a.init)(jax.random.key(0), x)["params"]
    ya = jax.jit(lambda p, x: a.apply({"params": p}, x))(p, x)
    yb = jax.jit(lambda p, x: b.apply({"params": p}, x))(p, x)  # same params load
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-6)


def test_qkv_layout_bnhd_parity(monkeypatch):
    """NEOSR_QKV_LAYOUT=bnhd (transpose-free einsum layout: head dim in the
    dot's batch spec instead of a materialized 5-D transpose; the DEFAULT
    since round 5, +20.5% on the swinir_medium train step) is the SAME
    math as the bhnd kill-switch path — full-net forward must match to
    float reassociation noise (same contraction dims; XLA may tile the
    dots differently for the two layouts)."""
    import jax

    from neosr_tpu.archs import build_network

    x = jnp.asarray(np.random.default_rng(3).random((1, 16, 16, 3), np.float32))
    net = build_network({"type": "swinir_small"}, scale=4)
    p = jax.jit(net.init)(jax.random.key(1), x)["params"]
    fwd = jax.jit(lambda p, x: net.apply({"params": p}, x))

    monkeypatch.setenv("NEOSR_QKV_LAYOUT", "bhnd")
    y0 = fwd(p, x)
    monkeypatch.setenv("NEOSR_QKV_LAYOUT", "bnhd")
    # env is read at trace time: force a fresh trace
    y1 = jax.jit(lambda p, x: net.apply({"params": p}, x))(p, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)
