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
