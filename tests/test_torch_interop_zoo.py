"""Forward-parity for the extended arch zoo: reference torch generators,
random-init, state_dicts imported into our flax archs — same pixels.

Complements tests/test_torch_interop.py (which covers the 9 ecosystem-core
families); together every registered generator family is numerically
verified against the reference torch forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_interop import _compare, _load_ref_arch, _state_dict_np  # noqa: E402


@pytest.fixture()
def x():
    return np.random.default_rng(1).random((1, 16, 16, 3)).astype(np.float32)


@pytest.fixture()
def cpu_pinmem(monkeypatch):
    real = torch.tensor

    def no_pin(*args, **kwargs):
        kwargs.pop("pin_memory", None)
        return real(*args, **kwargs)

    monkeypatch.setattr(torch, "tensor", no_pin)


def test_man_pth_import(x):
    mod = _load_ref_arch("man_arch")
    m = mod.man(n_resblocks=2, n_feats=24).eval()
    _compare(m, "man", {"n_resblocks": 2, "n_feats": 24}, _state_dict_np(m), x)


def test_man_multigroup_pth_import(x):
    mod = _load_ref_arch("man_arch")
    m = mod.man(n_resblocks=1, n_resgroups=2, n_feats=24).eval()
    _compare(m, "man", {"n_resblocks": 1, "n_resgroups": 2, "n_feats": 24},
             _state_dict_np(m), x)


@pytest.mark.parametrize("ups", ["ps", "gps", "dys"])
def test_mosr_pth_import(x, ups, cpu_pinmem):
    mod = _load_ref_arch("mosr_arch")
    m = mod.mosr(n_block=2, dim=16, upsampler=ups).eval()
    _compare(m, "mosr", {"n_block": 2, "dim": 16, "upsampler": ups},
             _state_dict_np(m), x, atol=1e-4)


def test_safmn_pth_import(x):
    mod = _load_ref_arch("safmn_arch")
    m = mod.safmn(dim=16, n_blocks=2).eval()
    _compare(m, "safmn", {"dim": 16, "n_blocks": 2}, _state_dict_np(m), x)


def test_light_safmnpp_pth_import(x):
    mod = _load_ref_arch("safmn_arch")
    m = mod.light_safmnpp(dim=16, n_blocks=2).eval()
    _compare(m, "light_safmnpp", {"dim": 16, "n_blocks": 2},
             _state_dict_np(m), x, atol=1e-4)


def _randomize_bn_stats(m, seed=0):
    """Give every BatchNorm non-trivial running statistics so the eval-mode
    comparison actually exercises the running-average path."""
    g = torch.Generator().manual_seed(seed)
    for mod_ in m.modules():
        if isinstance(mod_, torch.nn.modules.batchnorm._BatchNorm):
            mod_.running_mean.normal_(0.0, 0.5, generator=g)
            mod_.running_var.uniform_(0.5, 1.5, generator=g)
    return m


def test_eimn_pth_import(x):
    mod = _load_ref_arch("eimn_arch")
    # eval(): running-statistics BN (torch .eval() semantics); stats are
    # randomized so this genuinely tests the running-average path
    m = _randomize_bn_stats(
        mod.eimn(embed_dims=16, num_stages=2, depths=1)
    ).eval()
    _compare(m, "eimn", {"embed_dims": 16, "num_stages": 2, "depths": 1},
             _state_dict_np(m), x, atol=1e-4)


def test_eimn_train_mode_parity(x):
    """Batch-stat (train-mode) parity is preserved too: the train step
    normalizes by the current batch exactly like torch .train()."""
    import jax as _jax
    import jax.numpy as _jnp

    from neosr_tpu.archs import build_network
    from neosr_tpu.utils.torch_interop import convert_state_dict

    mod = _load_ref_arch("eimn_arch")
    m = mod.eimn(embed_dims=16, num_stages=2, depths=1).train()
    sd = _state_dict_np(m)
    xb = np.random.default_rng(9).random((2, 16, 16, 3)).astype(np.float32)
    params, bstats = convert_state_dict(sd, "eimn", with_stats=True)
    net = build_network(
        {"type": "eimn", "embed_dims": 16, "num_stages": 2, "depths": 1},
        scale=4,
    )
    ours, _ = _jax.jit(
        lambda v, x: net.apply(v, x, mutable=["batch_stats"])
    )({"params": params, "batch_stats": bstats}, _jnp.asarray(xb))
    with torch.no_grad():
        theirs = m(torch.from_numpy(xb.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
        atol=1e-4, rtol=1e-4,
    )


def test_ditn_pth_import(x):
    mod = _load_ref_arch("ditn_arch")
    m = mod.ditn(ITL_blocks=2, SAL_blocks=2, UFONE_blocks=1, patch_size=8).eval()
    _compare(
        m, "ditn", {"ITL_blocks": 2, "SAL_blocks": 2, "UFONE_blocks": 1,
                    "patch_size": 8},
        _state_dict_np(m), x, atol=1e-4,
    )


@pytest.mark.parametrize("scale", [4, 3])
def test_msdan_pth_import(x, scale):
    mod = _load_ref_arch("msdan_arch")
    m = mod.msdan(channels=16, num_DFEB=2, upscale_factor=scale).eval()
    from neosr_tpu.utils.torch_interop import convert_state_dict
    import jax, jax.numpy as jnp
    from neosr_tpu.archs import build_network

    params = convert_state_dict(_state_dict_np(m), "msdan", scale=scale)
    net = build_network({"type": "msdan", "channels": 16, "num_DFEB": 2}, scale=scale)
    ours = jax.jit(lambda p, xx: net.apply({"params": p}, xx))(params, jnp.asarray(x))
    with torch.no_grad():
        theirs = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("scale,pro", [(2, False), (3, False), (4, True)])
def test_cugan_pth_import(scale, pro):
    mod = _load_ref_arch("cugan_arch")
    m = mod.cugan(scale=scale, pro=pro).eval()
    # cugan pads 14-19px reflect internally: needs a real-sized input
    x = np.random.default_rng(2).random((1, 24, 24, 3)).astype(np.float32)
    _compare(m, "cugan", {"scale": scale, "pro": pro}, _state_dict_np(m),
             x, atol=2e-4)


def test_dctlsa_pth_import(x):
    mod = _load_ref_arch("dctlsa_arch")
    # eval(): running-statistics BN, randomized to exercise the path
    m = _randomize_bn_stats(mod.dctlsa(nf=16, num_head=2)).eval()
    _compare(m, "dctlsa", {"nf": 16, "num_head": 2}, _state_dict_np(m),
             x, atol=1e-4)


@pytest.mark.parametrize("ups", ["pixelshuffle", "pixelshuffledirect"])
def test_dat_pth_import(ups):
    mod = _load_ref_arch("dat_arch")
    # embed 32 -> DynamicPosBias hidden = 32//2//16 = 1 (non-degenerate;
    # the reference collapses to width 0 below embed 32, dat_arch.py:135)
    # eval(): running-statistics BN, randomized to exercise the path
    m = _randomize_bn_stats(
        mod.dat(embed_dim=32, depth=[2, 2], num_heads=[4, 4], split_size=[2, 4],
                expansion_factor=2, img_size=16, resi_connection="1conv",
                drop_path_rate=0.0, upsampler=ups)
    ).eval()
    x = np.random.default_rng(3).random((2, 16, 16, 3)).astype(np.float32)
    _compare(
        m, "dat",
        {"embed_dim": 32, "depth": (2, 2), "num_heads": (4, 4),
         "split_size": (2, 4), "expansion_factor": 2, "upsampler": ups},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_drct_pth_import(x):
    mod = _load_ref_arch("drct_arch")
    m = mod.drct(embed_dim=16, depths=[2, 2], num_heads=[2, 2], window_size=8,
                 gc=8, img_size=16, mlp_ratio=1, drop_path_rate=0.0,
                 upsampler="pixelshuffle").eval()
    _compare(
        m, "drct",
        {"embed_dim": 16, "depths": (2, 2), "num_heads": (2, 2),
         "window_size": 8, "gc": 8, "mlp_ratio": 1, "upsampler": "pixelshuffle"},
        _state_dict_np(m), x, atol=1e-4,
    )


@pytest.mark.parametrize("ups", ["pixelshuffle", "pixelshuffledirect"])
def test_srformer_pth_import(x, ups):
    mod = _load_ref_arch("srformer_arch")
    m = mod.srformer(embed_dim=16, depths=[2, 2], num_heads=[2, 2],
                     window_size=8, img_size=16, mlp_ratio=1,
                     upsampler=ups).eval()
    _compare(
        m, "srformer",
        {"embed_dim": 16, "depths": (2, 2), "num_heads": (2, 2),
         "window_size": 8, "mlp_ratio": 1, "upsampler": ups},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_rgt_pth_import():
    mod = _load_ref_arch("rgt_arch")
    # train(): matches our non-deterministic _time rule; drop_path 0
    m = mod.rgt(embed_dim=32, depth=[2, 2], num_heads=[4, 4], split_size=[4, 4],
                img_size=16, mlp_ratio=1, c_ratio=0.5, drop_path_rate=0.0).train()
    x = np.random.default_rng(5).random((2, 16, 16, 3)).astype(np.float32)
    from neosr_tpu.utils.torch_interop import convert_state_dict
    from neosr_tpu.archs import build_network
    import jax, jax.numpy as jnp

    params = convert_state_dict(_state_dict_np(m), "rgt")
    net = build_network(
        {"type": "rgt", "embed_dim": 32, "depth": (2, 2), "num_heads": (4, 4),
         "split_size": (4, 4), "mlp_ratio": 1, "c_ratio": 0.5,
         "drop_path_rate": 0.0}, scale=4)
    # deterministic=False selects the reference's train-mode _time rule
    ours = jax.jit(lambda p, xx: net.apply({"params": p}, xx, False))(
        params, jnp.asarray(x))
    with torch.no_grad():
        theirs = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
        atol=1e-4, rtol=1e-4)


def test_omnisr_pth_import(x):
    mod = _load_ref_arch("omnisr_arch")
    m = mod.omnisr_net(num_feat=16, res_num=2, block_num=1, window_size=8,
                       upsampling=4, pe=True, bias=True, ffn_bias=True).eval()
    _compare(
        m, "omnisr_net",
        {"num_feat": 16, "res_num": 2, "block_num": 1, "window_size": 8,
         "upsampling": 4, "pe": True},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_grformer_pth_import():
    mod = _load_ref_arch("grformer_arch")
    # img_size matches test input so the precomputed attn_mask path is used
    m = mod.grformer(embed_dim=16, depths=[2, 2], num_heads=[2, 2],
                     window_size=[4, 8], img_size=16, mlp_ratio=1,
                     drop_path_rate=0.0).eval()
    x = np.random.default_rng(6).random((1, 16, 16, 3)).astype(np.float32)
    _compare(
        m, "grformer",
        {"embed_dim": 16, "depths": (2, 2), "num_heads": (2, 2),
         "window_size": (4, 8), "mlp_ratio": 1},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_grformer_depth4_window_swap_pth_import():
    """depth >= 4 reaches the blocks with (bi//2)%2 == 1, which attend with
    the SWAPPED rectangle orientation (grformer_arch.py:295-296) while
    keeping the unswapped shift (grformer_arch.py:433-435)."""
    mod = _load_ref_arch("grformer_arch")
    m = mod.grformer(embed_dim=16, depths=[4], num_heads=[2],
                     window_size=[4, 8], img_size=16, mlp_ratio=1,
                     drop_path_rate=0.0).eval()
    x = np.random.default_rng(7).random((1, 16, 16, 3)).astype(np.float32)
    _compare(
        m, "grformer",
        {"embed_dim": 16, "depths": (4,), "num_heads": (2,),
         "window_size": (4, 8), "mlp_ratio": 1},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_hitsrf_pth_import(x):
    mod = _load_ref_arch("hitsrf_arch")
    m = mod.hit_srf(embed_dim=16, depths=[2, 2], num_heads=[2, 2],
                    base_win_size=[4, 4], mlp_ratio=1, img_size=16,
                    upsampler="pixelshuffledirect").eval()
    _compare(
        m, "hit_srf",
        {"embed_dim": 16, "depths": (2, 2), "num_heads": (2, 2),
         "base_win_size": (4, 4), "mlp_ratio": 1,
         "upsampler": "pixelshuffledirect"},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_hma_pth_import():
    mod = _load_ref_arch("hma_arch")
    m = mod.hma(embed_dim=32, depths=[2], num_heads=[4], window_size=8,
                interval_size=4, img_size=16, mlp_ratio=1,
                drop_path_rate=0.0).eval()
    x = np.random.default_rng(7).random((1, 16, 16, 3)).astype(np.float32)
    _compare(
        m, "hma",
        {"embed_dim": 32, "depths": (2,), "num_heads": (4,), "window_size": 8,
         "interval_size": 4, "mlp_ratio": 1, "drop_path_rate": 0.0},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_craft_pth_import():
    mod = _load_ref_arch("craft_arch")
    m = mod.craft(embed_dim=32, depths=[2], num_heads=[4], window_size=16,
                  split_size_0=2, split_size_1=4, mlp_ratio=1,
                  img_size=16).eval()
    x = np.random.default_rng(8).random((1, 16, 16, 3)).astype(np.float32)
    _compare(
        m, "craft",
        {"embed_dim": 32, "depths": (2,), "num_heads": (4,), "window_size": 16,
         "split_size_0": 2, "split_size_1": 4, "mlp_ratio": 1},
        _state_dict_np(m), x, atol=1e-4,
    )


def _roundtrip_strict(arch_file, torch_cls, our_type, our_kwargs, torch_kwargs,
                      x, atol=1e-4, train=False, allowed_missing=()):
    """Our random params -> torch-layout export -> torch load -> parity."""
    import jax
    import jax.numpy as jnp

    from neosr_tpu.archs import build_network
    from neosr_tpu.utils.torch_interop import to_torch_state_dict

    net = build_network({"type": our_type, **our_kwargs}, scale=4)
    params = jax.jit(net.init)(jax.random.key(2), jnp.asarray(x))["params"]
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_torch_state_dict(params, our_type).items()}
    mod = _load_ref_arch(arch_file)
    m = getattr(mod, torch_cls)(**torch_kwargs)
    result = m.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    assert all(k.endswith(tuple(allowed_missing)) for k in result.missing_keys), \
        result.missing_keys
    m = m.train() if train else m.eval()
    ours = jax.jit(lambda p, xx: net.apply({"params": p}, xx))(params, jnp.asarray(x))
    with torch.no_grad():
        theirs = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=atol, rtol=1e-4)


_SWIN_DERIVED = ("attn_mask", "relative_position_index",
                 "relative_position_index_SA", "relative_position_index_OCA")


def test_hat_pth_export_roundtrip(x):
    _roundtrip_strict(
        "hat_arch", "hat", "hat",
        {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
         "window_size": 8, "mlp_ratio": 2, "compress_ratio": 3,
         "squeeze_factor": 6},
        {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
         "window_size": 8, "mlp_ratio": 2, "compress_ratio": 3,
         "squeeze_factor": 6, "num_feat": 16, "img_size": 16, "upscale": 4,
         "upsampler": "pixelshuffle"},
        x, allowed_missing=_SWIN_DERIVED)


def test_atd_pth_export_roundtrip(x):
    _roundtrip_strict(
        "atd_arch", "atd", "atd",
        {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
         "window_size": 8, "category_size": 256, "num_tokens": 8,
         "reducted_dim": 4, "convffn_kernel_size": 5, "mlp_ratio": 1},
        {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
         "window_size": 8, "category_size": 256, "num_tokens": 8,
         "reducted_dim": 4, "convffn_kernel_size": 5, "mlp_ratio": 1,
         "img_size": 16, "upscale": 4, "num_feat": 16,
         "upsampler": "pixelshuffle"},
        x, atol=2e-4, allowed_missing=_SWIN_DERIVED)


def test_realplksr_pth_export_roundtrip(x, cpu_pinmem):
    _roundtrip_strict(
        "realplksr_arch", "realplksr", "realplksr",
        {"dim": 32, "n_blocks": 2, "kernel_size": 13, "dysample": True},
        {"dim": 32, "n_blocks": 2, "kernel_size": 13, "dysample": True,
         "norm_groups": 4},
        x, train=True)


def test_spanplus_pth_export_roundtrip(x, cpu_pinmem):
    _roundtrip_strict(
        "spanplus_arch", "spanplus", "spanplus",
        {"blocks": (2,), "feature_channels": 32, "upsampler": "dys"},
        {"blocks": [2], "feature_channels": 32, "upsampler": "dys"},
        x, train=True)


def test_plksr_pth_export_roundtrip(x, cpu_pinmem):
    _roundtrip_strict(
        "plksr_arch", "plksr", "plksr",
        {"dim": 32, "n_blocks": 2, "kernel_size": 13, "use_ea": True},
        {"dim": 32, "n_blocks": 2, "kernel_size": 13, "use_ea": True},
        x, train=True)


def test_drct_pth_export_roundtrip(x):
    _roundtrip_strict(
        "drct_arch", "drct", "drct",
        {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
         "window_size": 8, "mlp_ratio": 1.0, "gc": 8,
         "drop_path_rate": 0.0},
        {"embed_dim": 24, "depths": [2, 2], "num_heads": [3, 3],
         "window_size": 8, "mlp_ratio": 1.0, "gc": 8,
         "img_size": 16, "upscale": 4, "upsampler": "pixelshuffle"},
        x, allowed_missing=_SWIN_DERIVED)


def test_srformer_pth_export_roundtrip(x):
    _roundtrip_strict(
        "srformer_arch", "srformer", "srformer",
        {"embed_dim": 16, "depths": (2, 2), "num_heads": (2, 2),
         "window_size": 8, "mlp_ratio": 1, "upsampler": "pixelshuffle"},
        {"embed_dim": 16, "depths": [2, 2], "num_heads": [2, 2],
         "window_size": 8, "img_size": 16, "mlp_ratio": 1,
         "upsampler": "pixelshuffle"},
        x, allowed_missing=(*_SWIN_DERIVED, "aligned_relative_position_index"))


def test_man_pth_export_roundtrip(x):
    _roundtrip_strict(
        "man_arch", "man", "man",
        {"n_resblocks": 1, "n_resgroups": 2, "n_feats": 24},
        {"n_resblocks": 1, "n_resgroups": 2, "n_feats": 24},
        x)


def test_safmn_pth_export_roundtrip(x):
    _roundtrip_strict(
        "safmn_arch", "safmn", "safmn",
        {"dim": 16, "n_blocks": 2}, {"dim": 16, "n_blocks": 2}, x)


def test_light_safmnpp_pth_export_roundtrip(x):
    _roundtrip_strict(
        "safmn_arch", "light_safmnpp", "light_safmnpp",
        {"dim": 16, "n_blocks": 2}, {"dim": 16, "n_blocks": 2}, x,
        atol=1e-4)


@pytest.mark.parametrize("ups", ["ps", "dys"])
def test_mosr_pth_export_roundtrip(x, ups, cpu_pinmem):
    _roundtrip_strict(
        "mosr_arch", "mosr", "mosr",
        {"n_block": 2, "dim": 16, "upsampler": ups},
        {"n_block": 2, "dim": 16, "upsampler": ups}, x, atol=1e-4)


def test_cugan_pth_export_roundtrip(cpu_pinmem):
    x = np.random.default_rng(2).random((1, 24, 24, 3)).astype(np.float32)
    _roundtrip_strict(
        "cugan_arch", "cugan", "cugan",
        {"scale": 4, "pro": True}, {"scale": 4, "pro": True}, x,
        atol=2e-4, allowed_missing=("pro",))


def test_omnisr_pth_export_roundtrip(x):
    _roundtrip_strict(
        "omnisr_arch", "omnisr_net", "omnisr_net",
        {"num_feat": 16, "res_num": 2, "block_num": 1, "window_size": 8,
         "upsampling": 4, "pe": True},
        {"num_feat": 16, "res_num": 2, "block_num": 1, "window_size": 8,
         "upsampling": 4, "pe": True, "bias": True, "ffn_bias": True},
        x, atol=1e-4)


def test_hitsrf_pth_export_roundtrip(x):
    _roundtrip_strict(
        "hitsrf_arch", "hit_srf", "hit_srf",
        {"embed_dim": 16, "depths": (2, 2), "num_heads": (2, 2),
         "base_win_size": (4, 4), "mlp_ratio": 1,
         "upsampler": "pixelshuffledirect"},
        {"embed_dim": 16, "depths": [2, 2], "num_heads": [2, 2],
         "base_win_size": [4, 4], "mlp_ratio": 1, "img_size": 16,
         "upsampler": "pixelshuffledirect"},
        x, atol=1e-4, allowed_missing=_SWIN_DERIVED)


def test_rgt_pth_export_roundtrip():
    """Like _roundtrip_strict but applies with deterministic=False: the
    reference's train-mode _time rule (matching its .train())."""
    import jax
    import jax.numpy as jnp

    from neosr_tpu.archs import build_network
    from neosr_tpu.utils.torch_interop import to_torch_state_dict

    x = np.random.default_rng(5).random((2, 16, 16, 3)).astype(np.float32)
    kwargs = {"embed_dim": 32, "depth": (2, 2), "num_heads": (4, 4),
              "split_size": (4, 4), "mlp_ratio": 1, "c_ratio": 0.5,
              "drop_path_rate": 0.0}
    net = build_network({"type": "rgt", **kwargs}, scale=4)
    params = jax.jit(net.init)(jax.random.key(2), jnp.asarray(x))["params"]
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_torch_state_dict(params, "rgt").items()}
    mod = _load_ref_arch("rgt_arch")
    m = mod.rgt(embed_dim=32, depth=[2, 2], num_heads=[4, 4],
                split_size=[4, 4], img_size=16, mlp_ratio=1, c_ratio=0.5,
                drop_path_rate=0.0)
    result = m.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    allowed = (*_SWIN_DERIVED, "rpe_biases", "attn_mask_0", "attn_mask_1")
    assert all(k.endswith(allowed) for k in result.missing_keys), \
        result.missing_keys
    m = m.train()
    ours = jax.jit(lambda p, xx: net.apply({"params": p}, xx, False))(
        params, jnp.asarray(x))
    with torch.no_grad():
        theirs = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
        atol=1e-4, rtol=1e-4)


def test_grformer_pth_export_roundtrip():
    x = np.random.default_rng(6).random((1, 16, 16, 3)).astype(np.float32)
    _roundtrip_strict(
        "grformer_arch", "grformer", "grformer",
        {"embed_dim": 16, "depths": (2, 2), "num_heads": (2, 2),
         "window_size": (4, 8), "mlp_ratio": 1},
        {"embed_dim": 16, "depths": [2, 2], "num_heads": [2, 2],
         "window_size": [4, 8], "img_size": 16, "mlp_ratio": 1,
         "drop_path_rate": 0.0},
        x, atol=1e-4,
        allowed_missing=(*_SWIN_DERIVED, "relative_coords_table", "attn_mask",
                         # ESRPB's table buffer is derived from its MLP
                         "relative_position_bias_table"))


def test_hma_pth_export_roundtrip():
    x = np.random.default_rng(7).random((1, 16, 16, 3)).astype(np.float32)
    _roundtrip_strict(
        "hma_arch", "hma", "hma",
        {"embed_dim": 32, "depths": (2,), "num_heads": (4,), "window_size": 8,
         "interval_size": 4, "mlp_ratio": 1, "drop_path_rate": 0.0},
        {"embed_dim": 32, "depths": [2], "num_heads": [4], "window_size": 8,
         "interval_size": 4, "img_size": 16, "mlp_ratio": 1,
         "drop_path_rate": 0.0},
        x, atol=1e-4, allowed_missing=(*_SWIN_DERIVED, "rpi_sa", "attn_mask"))


def test_ditn_pth_export_roundtrip(x):
    _roundtrip_strict(
        "ditn_arch", "ditn", "ditn",
        {"ITL_blocks": 2, "SAL_blocks": 2, "UFONE_blocks": 1,
         "patch_size": 8},
        {"ITL_blocks": 2, "SAL_blocks": 2, "UFONE_blocks": 1,
         "patch_size": 8},
        x, atol=1e-4, allowed_missing=("temperature",))


@pytest.mark.parametrize("scale", [4, 3])
def test_msdan_pth_export_roundtrip(scale):
    x = np.random.default_rng(9).random((1, 16, 16, 3)).astype(np.float32)
    unused = ("BSConv_3", "BSConv1_3") if scale in (2, 4) else \
             ("BSConv_2", "BSConv1_2")
    _roundtrip_strict(
        "msdan_arch", "msdan", "msdan",
        {"channels": 16, "num_DFEB": 2, "upscale_factor": scale},
        {"channels": 16, "num_DFEB": 2, "upscale_factor": scale},
        x, atol=1e-4,
        allowed_missing=tuple(
            suffix for stage in unused
            for suffix in (f"{stage}.pw.weight", f"{stage}.pw.bias",
                           f"{stage}.dw.weight", f"{stage}.dw.bias")))


def test_craft_pth_export_roundtrip():
    x = np.random.default_rng(8).random((1, 16, 16, 3)).astype(np.float32)
    _roundtrip_strict(
        "craft_arch", "craft", "craft",
        {"embed_dim": 32, "depths": (2,), "num_heads": (4,), "window_size": 16,
         "split_size_0": 2, "split_size_1": 4, "mlp_ratio": 1},
        {"embed_dim": 32, "depths": [2], "num_heads": [4], "window_size": 16,
         "split_size_0": 2, "split_size_1": 4, "mlp_ratio": 1,
         "img_size": 16},
        x, atol=1e-4,
        allowed_missing=(*_SWIN_DERIVED, "rpe_biases",
                         "relative_position_index_h",
                         "relative_position_index_v",
                         "biases_v", "biases_h"))


def _roundtrip_strict_bn(arch_file, torch_cls, our_type, our_kwargs,
                         torch_kwargs, x, atol=1e-4, allowed_missing=()):
    """BN-family roundtrip: random flax params + RANDOMIZED running stats ->
    torch-layout export (running_mean/var included) -> torch .eval() load ->
    eval-forward parity.  Proves the running statistics transfer exactly."""
    import jax
    import jax.numpy as jnp

    from neosr_tpu.archs import build_network
    from neosr_tpu.utils.torch_interop import to_torch_state_dict

    net = build_network({"type": our_type, **our_kwargs}, scale=4)
    variables = jax.jit(net.init)(jax.random.key(2), jnp.asarray(x))
    params = variables["params"]
    rng = np.random.default_rng(31)

    def _randstat(leaf_path, leaf):
        name = leaf_path[-1].key
        if name == "mean":
            return jnp.asarray(rng.normal(0.0, 0.5, leaf.shape).astype(np.float32))
        return jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape).astype(np.float32))

    bstats = jax.tree_util.tree_map_with_path(
        _randstat, variables["batch_stats"]
    )
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_torch_state_dict(
              params, our_type, batch_stats=bstats).items()}
    mod = _load_ref_arch(arch_file)
    m = getattr(mod, torch_cls)(**torch_kwargs)
    result = m.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    assert all(k.endswith(tuple(allowed_missing)) for k in result.missing_keys), \
        result.missing_keys
    m = m.eval()
    ours = jax.jit(lambda v, xx: net.apply(v, xx))(
        {"params": params, "batch_stats": bstats}, jnp.asarray(x))
    with torch.no_grad():
        theirs = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
        atol=atol, rtol=1e-4)


def test_eimn_pth_export_roundtrip(x):
    _roundtrip_strict_bn(
        "eimn_arch", "eimn", "eimn",
        {"embed_dims": 16, "num_stages": 2, "depths": 1},
        {"embed_dims": 16, "num_stages": 2, "depths": 1}, x)


def test_dctlsa_pth_export_roundtrip(x):
    # atol 5e-3: flax-init weights drive dctlsa's dense-fusion outputs to
    # ~±9 (vs ~±1 under torch init in the import test), so fp32
    # accumulation noise scales up; layout exactness is separately proven
    # bit-stable by the flax->torch->flax roundtrip in the converters
    _roundtrip_strict_bn(
        "dctlsa_arch", "dctlsa", "dctlsa",
        {"nf": 16, "num_head": 2}, {"nf": 16, "num_head": 2}, x,
        atol=5e-3,
        allowed_missing=("attn_mask", "relative_position_index"))


@pytest.mark.parametrize("ups", ["pixelshuffle", "pixelshuffledirect"])
def test_dat_pth_export_roundtrip(ups):
    xb = np.random.default_rng(5).random((2, 16, 16, 3)).astype(np.float32)
    _roundtrip_strict_bn(
        "dat_arch", "dat", "dat",
        {"embed_dim": 32, "depth": (2, 2), "num_heads": (4, 4),
         "split_size": (2, 4), "expansion_factor": 2, "upsampler": ups},
        {"embed_dim": 32, "depth": [2, 2], "num_heads": [4, 4],
         "split_size": [2, 4], "expansion_factor": 2, "img_size": 16,
         "resi_connection": "1conv", "drop_path_rate": 0.0,
         "upsampler": ups},
        xb, allowed_missing=("attn_mask_0", "attn_mask_1", "rpe_biases",
                             "relative_position_index"))
