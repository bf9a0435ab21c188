"""Torch-checkpoint import parity: reference torch generators, random-init,
exported as state_dicts, imported into our flax archs — forwards must match.

This is the ecosystem-interop guarantee: a user's existing neosr /
openmodeldb .pth generator keeps producing the same pixels here."""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from neosr_tpu.archs import build_network
from neosr_tpu.utils.torch_interop import PARAM_KEYS, convert_state_dict


def _load_ref_arch(name: str):
    """Load one reference arch file by path, bypassing the package __init__
    (it imports the world and parses sys.argv at import time)."""
    # check each stub module individually: other test files (test_losses)
    # install a partial "neosr" stub first, so keying on the root package
    # alone would skip the arch-side stubs under pytest's full-suite order
    for mod_name in ("neosr", "neosr.utils", "neosr.archs"):
        if mod_name not in sys.modules:
            pkg = types.ModuleType(mod_name)
            pkg.__path__ = []
            sys.modules[mod_name] = pkg
    if "neosr.utils.registry" not in sys.modules:
        registry_mod = types.ModuleType("neosr.utils.registry")

        class _FakeRegistry:
            def register(self, obj=None, suffix=None):
                if obj is None:
                    return lambda f: f
                return obj

        registry_mod.ARCH_REGISTRY = _FakeRegistry()
        sys.modules["neosr.utils.registry"] = registry_mod
    if not hasattr(sys.modules["neosr.utils.registry"], "ARCH_REGISTRY"):
        reg = sys.modules["neosr.utils.registry"]
        reg.ARCH_REGISTRY = reg.LOSS_REGISTRY  # test_losses' fake registry
    if "neosr.utils.options" not in sys.modules:
        # net_opt() parses CLI options at import time (arch_util.py:12-27);
        # stub the options module so the real arch_util (DySample, etc.)
        # loads cleanly with scale 4 / training true
        options_mod = types.ModuleType("neosr.utils.options")
        options_mod.parse_options = lambda root, is_train=True: (
            {"scale": 4, "datasets": {"train": {}}},
            types.SimpleNamespace(input=None),
        )
        sys.modules["neosr.utils.options"] = options_mod

    if name != "arch_util" and "neosr.archs.arch_util" not in sys.modules:
        _load_ref_arch("arch_util")

    full = f"neosr.archs.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, f"/root/reference/neosr/archs/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def _state_dict_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _compare(torch_model, our_type, our_kwargs, sd, x_nhwc, atol=2e-5):
    # family() resolves presets; BN archs also get running statistics so
    # the plain (eval-mode) apply matches torch .eval()
    params, bstats = convert_state_dict(sd, our_type, with_stats=True)
    net = build_network({"type": our_type, **our_kwargs}, scale=4)
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    ours = jax.jit(lambda v, x: net.apply(v, x))(
        variables, jnp.asarray(x_nhwc)
    )
    with torch.no_grad():
        theirs = torch_model(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=atol, rtol=1e-4)


@pytest.fixture()
def x():
    return np.random.default_rng(0).random((1, 16, 16, 3)).astype(np.float32)


@pytest.fixture()
def cpu_pinmem(monkeypatch):
    """Reference DySample calls torch.tensor(..., pin_memory=True)
    (arch_util.py:92), which needs CUDA; strip it on the CPU-only build."""
    real = torch.tensor

    def no_pin(*args, **kwargs):
        kwargs.pop("pin_memory", None)
        return real(*args, **kwargs)

    monkeypatch.setattr(torch, "tensor", no_pin)


def test_compact_pth_import(x):
    mod = _load_ref_arch("compact_arch")
    m = mod.compact(num_feat=24, num_conv=4).eval()
    _compare(m, "compact", {"num_feat": 24, "num_conv": 4}, _state_dict_np(m), x)


def test_esrgan_pth_import(x):
    mod = _load_ref_arch("esrgan_arch")
    m = mod.esrgan(num_feat=32, num_block=3, num_grow_ch=16).eval()
    _compare(
        m, "esrgan", {"num_feat": 32, "num_block": 3, "num_grow_ch": 16},
        _state_dict_np(m), x,
    )


def test_span_pth_import(x):
    mod = _load_ref_arch("span_arch")
    # train mode: forward uses the raw sk+conv branches we import
    # (eval mode folds them into eval_conv — same function, derived weights)
    m = mod.span(num_in_ch=3, num_out_ch=3, feature_channels=32, norm=False).train()
    _compare(m, "span", {"feature_channels": 32, "norm": False}, _state_dict_np(m), x)


def test_span_eval_conv_matches_train_branches(x):
    """The fused eval path of the reference equals its train branches, so
    importing train branches preserves deployed-model behavior too."""
    mod = _load_ref_arch("span_arch")
    m = mod.span(num_in_ch=3, num_out_ch=3, feature_channels=32, norm=False)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        y_train = m.train()(xt)
        y_eval = m.eval()(xt)
    np.testing.assert_allclose(y_train.numpy(), y_eval.numpy(), atol=2e-5)


def test_wrapped_checkpoint_roundtrip(tmp_path, x):
    """Full file path: torch.save({'params': sd}, .pth) -> model loads it."""
    mod = _load_ref_arch("compact_arch")
    m = mod.compact(num_feat=24, num_conv=4).eval()
    path = tmp_path / "net_g.pth"
    torch.save({"params": m.state_dict()}, path)

    from neosr_tpu.utils.torch_interop import load_torch_checkpoint

    params = load_torch_checkpoint(path, "compact")
    net = build_network({"type": "compact", "num_feat": 24, "num_conv": 4}, scale=4)
    ours = net.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4
    )
    assert PARAM_KEYS[0] == "params-ema"


def test_swinir_pth_import(x):
    mod = _load_ref_arch("swinir_arch")
    m = mod.swinir(
        embed_dim=24, depths=(2, 2), num_heads=(3, 3), window_size=8,
        mlp_ratio=2, upsampler="pixelshuffledirect", img_size=16, upscale=4,
    ).eval()
    _compare(
        m, "swinir",
        {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
         "window_size": 8, "mlp_ratio": 2, "upsampler": "pixelshuffledirect"},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_swinir_pixelshuffle_import(x):
    mod = _load_ref_arch("swinir_arch")
    m = mod.swinir(
        embed_dim=24, depths=(2, 2), num_heads=(3, 3), window_size=8,
        mlp_ratio=2, upsampler="pixelshuffle", img_size=16, upscale=4,
    ).eval()
    _compare(
        m, "swinir",
        {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
         "window_size": 8, "mlp_ratio": 2, "upsampler": "pixelshuffle"},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_swinir_nearestconv_3conv_import(x):
    mod = _load_ref_arch("swinir_arch")
    m = mod.swinir(
        embed_dim=24, depths=(2, 2), num_heads=(3, 3), window_size=8,
        mlp_ratio=2, upsampler="nearest+conv", resi_connection="3conv",
        img_size=16, upscale=4,
    ).eval()
    _compare(
        m, "swinir",
        {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
         "window_size": 8, "mlp_ratio": 2, "upsampler": "nearest+conv",
         "resi_connection": "3conv"},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_hat_pth_import(x):
    mod = _load_ref_arch("hat_arch")
    m = mod.hat(
        embed_dim=24, depths=(2, 2), num_heads=(3, 3), window_size=8,
        mlp_ratio=2, upsampler="pixelshuffle", img_size=16, upscale=4,
        compress_ratio=3, squeeze_factor=6, num_feat=16,
    ).eval()
    _compare(
        m, "hat",
        {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
         "window_size": 8, "mlp_ratio": 2, "compress_ratio": 3,
         "squeeze_factor": 6},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_atd_pth_import(x):
    # category_size >= n puts all tokens in one AC-MSA group, removing the
    # reference's unstable-sort tie ambiguity -> exact parity
    mod = _load_ref_arch("atd_arch")
    m = mod.atd(
        embed_dim=24, depths=(2, 2), num_heads=(3, 3), window_size=8,
        category_size=256, num_tokens=8, reducted_dim=4, convffn_kernel_size=5,
        mlp_ratio=1, upsampler="pixelshuffle", img_size=16, upscale=4,
        num_feat=16,
    ).eval()
    _compare(
        m, "atd",
        {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
         "window_size": 8, "category_size": 256, "num_tokens": 8,
         "reducted_dim": 4, "convffn_kernel_size": 5, "mlp_ratio": 1},
        _state_dict_np(m), x, atol=2e-5,
    )


def test_atd_pth_import_grouped(x):
    # multi-group AC-MSA: torch sorts category ids with stable=False
    # (atd_arch.py:331), so tie order among equal ids is unspecified; group
    # membership differs on ties and outputs agree only approximately
    mod = _load_ref_arch("atd_arch")
    m = mod.atd(
        embed_dim=24, depths=(2, 2), num_heads=(3, 3), window_size=8,
        category_size=16, num_tokens=8, reducted_dim=4, convffn_kernel_size=5,
        mlp_ratio=1, upsampler="pixelshuffle", img_size=16, upscale=4,
        num_feat=16,
    ).eval()
    _compare(
        m, "atd",
        {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
         "window_size": 8, "category_size": 16, "num_tokens": 8,
         "reducted_dim": 4, "convffn_kernel_size": 5, "mlp_ratio": 1},
        _state_dict_np(m), x, atol=2e-3,
    )


@pytest.mark.parametrize("ups,extra", [
    ("pixelshuffledirect", {}),
    ("pixelshuffle", {}),
    ("nearest+conv", {"resi_connection": "3conv"}),
])
def test_swinir_pth_export_roundtrip(x, ups, extra):
    """Our swinir params -> torch layout -> reference model -> same pixels.
    Derived buffers (attn_mask, relative_position_index) are constructed by
    the torch model itself, so strict=False with only those missing."""
    from neosr_tpu.utils.torch_interop import to_torch_state_dict

    kwargs = {"embed_dim": 24, "depths": (2, 2), "num_heads": (3, 3),
              "window_size": 8, "mlp_ratio": 2, "upsampler": ups, **extra}
    net = build_network({"type": "swinir", **kwargs}, scale=4)
    params = jax.jit(net.init)(jax.random.key(1), jnp.asarray(x))["params"]
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in to_torch_state_dict(params, "swinir").items()}

    mod = _load_ref_arch("swinir_arch")
    m = mod.swinir(img_size=16, upscale=4, **kwargs)
    result = m.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    allowed = ("attn_mask", "relative_position_index")
    assert all(k.endswith(allowed) for k in result.missing_keys), result.missing_keys
    m = m.eval()
    ours = jax.jit(lambda p, xx: net.apply({"params": p}, xx))(params, jnp.asarray(x))
    with torch.no_grad():
        theirs = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )


def test_unsupported_arch_raises():
    with pytest.raises(ValueError, match="No torch-checkpoint converter"):
        convert_state_dict({}, "not_a_real_arch")


def _roundtrip(arch_file, torch_cls, our_type, our_kwargs, torch_kwargs, x,
               atol=2e-5, eval_mode=True):
    """Our random params -> torch-layout export -> strict torch load ->
    forward parity. Proves models trained here deploy into the ecosystem."""
    from neosr_tpu.utils.torch_interop import to_torch_state_dict

    net = build_network({"type": our_type, **our_kwargs}, scale=4)
    params = jax.jit(net.init)(jax.random.key(1), jnp.asarray(x))["params"]
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_torch_state_dict(params, our_type).items()}

    mod = _load_ref_arch(arch_file)
    m = getattr(mod, torch_cls)(**torch_kwargs)
    m.load_state_dict(sd, strict=True)
    m = m.eval() if eval_mode else m.train()
    ours = jax.jit(lambda p, xx: net.apply({"params": p}, xx))(params, jnp.asarray(x))
    with torch.no_grad():
        theirs = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=atol, rtol=1e-4
    )


def test_compact_pth_export_roundtrip(x):
    _roundtrip("compact_arch", "compact", "compact",
               {"num_feat": 24, "num_conv": 4},
               {"num_feat": 24, "num_conv": 4}, x)


def test_esrgan_pth_export_roundtrip(x):
    _roundtrip("esrgan_arch", "esrgan", "esrgan",
               {"num_feat": 32, "num_block": 3, "num_grow_ch": 16},
               {"num_feat": 32, "num_block": 3, "num_grow_ch": 16}, x)


def test_span_pth_export_roundtrip(x):
    # eval mode exercises the exported eval_conv fusion (span_arch.py:143-179)
    _roundtrip("span_arch", "span", "span",
               {"feature_channels": 32, "norm": False},
               {"num_in_ch": 3, "num_out_ch": 3, "feature_channels": 32,
                "norm": False}, x, atol=1e-4)


def test_plksr_pth_import(x):
    mod = _load_ref_arch("plksr_arch")
    m = mod.plksr(dim=32, n_blocks=2, kernel_size=13).train()
    _compare(
        m, "plksr", {"dim": 32, "n_blocks": 2, "kernel_size": 13},
        _state_dict_np(m), x,
    )


def test_plksr_tiny_rect_sparse_import(x):
    mod = _load_ref_arch("plksr_arch")
    # kernel 9 -> rect kernels (9,3)/(3,9)/(3,3): k//3 must be odd for the
    # reference's same-padding to line up (k=13 -> n=4 breaks torch too)
    m = mod.plksr(
        dim=32, n_blocks=2, kernel_size=9, lk_type="RectSparsePLK", use_ea=False
    ).train()
    _compare(
        m, "plksr",
        {"dim": 32, "n_blocks": 2, "kernel_size": 9,
         "lk_type": "RectSparsePLK", "use_ea": False},
        _state_dict_np(m), x,
    )


def test_realplksr_pth_import(x):
    mod = _load_ref_arch("realplksr_arch")
    m = mod.realplksr(dim=32, n_blocks=2, kernel_size=13, norm_groups=4).train()
    _compare(
        m, "realplksr", {"dim": 32, "n_blocks": 2, "kernel_size": 13},
        _state_dict_np(m), x,
    )


def test_realplksr_dysample_import(x, cpu_pinmem):
    mod = _load_ref_arch("realplksr_arch")
    m = mod.realplksr(dim=32, n_blocks=2, kernel_size=13, dysample=True).train()
    _compare(
        m, "realplksr", {"dim": 32, "n_blocks": 2, "kernel_size": 13,
                         "dysample": True},
        _state_dict_np(m), x, atol=1e-4,
    )


def test_spanplus_ps_import(x):
    mod = _load_ref_arch("spanplus_arch")
    m = mod.spanplus(blocks=[2], feature_channels=32, upsampler="ps").train()
    _compare(
        m, "spanplus", {"blocks": (2,), "feature_channels": 32, "upsampler": "ps"},
        _state_dict_np(m), x,
    )


def test_spanplus_dys_import(x, cpu_pinmem):
    mod = _load_ref_arch("spanplus_arch")
    m = mod.spanplus(blocks=[2], feature_channels=32, upsampler="dys").train()
    _compare(
        m, "spanplus", {"blocks": (2,), "feature_channels": 32, "upsampler": "dys"},
        _state_dict_np(m), x, atol=1e-4,
    )
