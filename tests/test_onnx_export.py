"""ONNX export via torch mirror modules (utils/torch_mirror.py).

Mirrors the reference's export+verify contract (/root/reference/convert.py:
89-182, 65-86): the exported graph's function — here the torch mirror that
torch.onnx.export serializes — must match the live flax forward within
rtol 0.01 / atol 0.001 on random input.  We assert much tighter (1e-4) in
fp32, then check the serialized ModelProto header.
"""

import numpy as np
import pytest

CASES = [
    ("compact", {"num_feat": 16, "num_conv": 2}, 4),
    ("span", {"feature_channels": 16}, 4),
    ("esrgan", {"num_feat": 16, "num_block": 2, "num_grow_ch": 8}, 4),
    ("esrgan", {"num_feat": 16, "num_block": 2, "num_grow_ch": 8}, 2),
    ("realplksr", {"dim": 16, "n_blocks": 2, "kernel_size": 13}, 4),
    ("realplksr", {"dim": 16, "n_blocks": 2, "kernel_size": 13,
                   "dysample": True}, 4),
    ("spanplus", {"feature_channels": 16, "blocks": [2]}, 4),
    ("spanplus", {"feature_channels": 16, "blocks": [2],
                  "upsampler": "ps"}, 4),
    ("plksr", {"dim": 16, "n_blocks": 2, "kernel_size": 13}, 4),
    ("plksr", {"dim": 16, "n_blocks": 2, "kernel_size": 13,
               "ccm_type": "ICCM", "use_ea": False}, 2),
    ("swinir", {"embed_dim": 16, "depths": [2, 2], "num_heads": [2, 2],
                "window_size": 8, "mlp_ratio": 1.0, "drop_path_rate": 0.0,
                "upsampler": "pixelshuffledirect"}, 4),
    ("swinir", {"embed_dim": 16, "depths": [2], "num_heads": [2],
                "window_size": 8, "mlp_ratio": 1.0, "drop_path_rate": 0.0,
                "upsampler": "pixelshuffle"}, 4),
    ("hat", {"embed_dim": 24, "depths": [2, 2], "num_heads": [3, 3],
             "window_size": 8, "mlp_ratio": 2.0, "compress_ratio": 3,
             "squeeze_factor": 6, "drop_path_rate": 0.0}, 4),
    ("atd", {"embed_dim": 24, "depths": [2], "num_heads": [3],
             "window_size": 8, "category_size": 256, "num_tokens": 8,
             "reducted_dim": 4, "convffn_kernel_size": 5, "mlp_ratio": 1.0,
             "upsampler": "pixelshuffledirect"}, 4),
    ("drct", {"embed_dim": 24, "depths": [2], "num_heads": [3],
              "window_size": 8, "mlp_ratio": 1.0, "gc": 8,
              "drop_path_rate": 0.0}, 4),
    ("cugan", {"pro": True}, 4),
    ("cugan", {"pro": False}, 2),
    ("safmn", {"dim": 16, "n_blocks": 2}, 4),
    ("man", {"n_resblocks": 1, "n_resgroups": 2, "n_feats": 24}, 4),
    ("mosr", {"n_block": 2, "dim": 16, "upsampler": "ps"}, 4),
    ("mosr", {"n_block": 2, "dim": 16, "upsampler": "dys"}, 4),
    ("mosr", {"n_block": 2, "dim": 16, "upsampler": "gps"}, 2),
    ("light_safmnpp", {"dim": 16, "n_blocks": 2}, 4),
    ("srformer", {"embed_dim": 16, "depths": [2], "num_heads": [2],
                  "window_size": 8, "mlp_ratio": 1.0, "drop_path_rate": 0.0,
                  "upsampler": "pixelshuffle"}, 4),
    ("msdan", {"channels": 16, "num_DFEB": 2}, 4),
    ("msdan", {"channels": 16, "num_DFEB": 2}, 3),
    ("hit_srf", {"embed_dim": 20, "depths": [2], "num_heads": [2],
                 "base_win_size": [4, 4], "mlp_ratio": 1.0}, 4),
    ("grformer", {"embed_dim": 16, "depths": [2], "num_heads": [2],
                  "window_size": [4, 8], "mlp_ratio": 1.0}, 4),
    ("rgt", {"embed_dim": 32, "depth": [2], "num_heads": [4],
             "split_size": [4, 8], "mlp_ratio": 1.0, "c_ratio": 0.5,
             "drop_path_rate": 0.0}, 4),
    ("omnisr_net", {"num_feat": 16, "res_num": 2, "block_num": 1,
                    "window_size": 8, "upsampling": 4, "pe": True}, 4),
    ("eimn", {"embed_dims": 16, "num_stages": 2, "depths": 1}, 4),
    ("dctlsa", {"nf": 16, "num_head": 2}, 4),
    ("dat", {"embed_dim": 32, "depth": [2, 2], "num_heads": [4, 4],
             "split_size": [2, 4], "expansion_factor": 2.0,
             "upsampler": "pixelshuffle"}, 4),
    ("dat", {"embed_dim": 32, "depth": [2], "num_heads": [4],
             "split_size": [2, 4], "expansion_factor": 2.0,
             "upsampler": "pixelshuffledirect"}, 4),
    ("hma", {"embed_dim": 32, "depths": [2, 2], "num_heads": [2, 2],
             "window_size": 8, "interval_size": 4, "mlp_ratio": 1.0,
             "drop_path_rate": 0.0}, 4),
    # craft/ditn: the reference refuses ONNX for both
    # (/root/reference/convert.py:91); we export them anyway
    ("ditn", {"dim": 16, "ITL_blocks": 2, "SAL_blocks": 2,
              "ffn_expansion_factor": 1.0, "patch_size": 8}, 4),
    ("craft", {"embed_dim": 16, "depths": [2], "num_heads": [2],
               "split_size_0": 4, "split_size_1": 8, "window_size": 8,
               "mlp_ratio": 1.0}, 4),
]


@pytest.mark.parametrize(("arch", "opt", "scale"), CASES)
def test_mirror_parity_and_onnx(arch, opt, scale, tmp_path):
    import jax
    import jax.numpy as jnp
    import torch

    from neosr_tpu.archs import build_network
    from neosr_tpu.utils.torch_mirror import build_torch_mirror, export_onnx

    net = build_network({"type": arch, **opt}, scale=scale, dtype=jnp.float32)
    x = np.random.default_rng(0).random((1, 24, 24, 3), np.float32)
    variables = net.init(jax.random.key(0), jnp.asarray(x))
    params = variables["params"]
    bstats = dict(variables.get("batch_stats", {}))
    if bstats:  # BN archs: randomize running stats so eval mode is real
        rng = np.random.default_rng(13)
        bstats = jax.tree_util.tree_map_with_path(
            lambda p, l: jnp.asarray(
                rng.normal(0.0, 0.5, l.shape).astype(np.float32)
                if p[-1].key == "mean"
                else rng.uniform(0.5, 1.5, l.shape).astype(np.float32)),
            bstats)
    apply_vars = {"params": params, **({"batch_stats": bstats} if bstats else {})}
    want = np.asarray(net.apply(apply_vars, jnp.asarray(x)))

    mirror = build_torch_mirror(arch, opt, scale, params,
                                batch_stats=bstats or None)
    with torch.inference_mode():
        got = mirror(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    # rgt's recursive reduction + long-range attention accumulate a bit
    # more fp32 noise than the window transformers; dctlsa's dense
    # concats drive random-init outputs to ~±130, scaling the noise up
    atol = {"rgt": 3e-4, "dctlsa": 8e-3, "dat": 2e-4}.get(arch, 1e-5)
    np.testing.assert_allclose(got.transpose(0, 2, 3, 1), want,
                               rtol=1e-4, atol=atol)

    path = tmp_path / f"{arch}_{scale}.onnx"
    export_onnx(mirror, path, shape_hw=(24, 24), dynamic=True)
    blob = path.read_bytes()
    assert len(blob) > 1000
    # ModelProto: field 1 (ir_version) varint, then producer_name "pytorch"
    assert blob[0] == 0x08
    assert b"pytorch" in blob[:64]
    assert b"input" in blob and b"output" in blob


def test_mirror_unknown_arch_raises():
    import pytest as _pytest

    from neosr_tpu.utils.torch_mirror import build_torch_mirror

    with _pytest.raises(ValueError, match="no ONNX torch mirror"):
        build_torch_mirror("unet", {}, 4, {})
