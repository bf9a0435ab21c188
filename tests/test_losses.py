"""Numerical parity tests: our jnp losses vs the reference torch losses.

The reference package at /root/reference is imported (read-only) as the
golden implementation; inputs are identical random images (NHWC for us,
NCHW for torch)."""

import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

# stub the absent torchvision so reference modules import (only losses we
# compare against are torchvision-free)
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.make_grid = lambda *a, **k: None
    tv_transforms = types.ModuleType("torchvision.transforms")

    class _FakeGaussianBlur:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision absent")

    tv_transforms.GaussianBlur = _FakeGaussianBlur
    tv_transforms.__path__ = []  # mark as package
    tv_functional = types.ModuleType("torchvision.transforms.functional")

    def _rgb_to_grayscale(img, num_output_channels=1):
        w = torch.tensor([0.299, 0.587, 0.114], dtype=img.dtype).view(1, 3, 1, 1)
        gray = (img * w).sum(dim=1, keepdim=True)
        return gray.repeat(1, num_output_channels, 1, 1)

    tv_functional.rgb_to_grayscale = _rgb_to_grayscale
    tv_functional.normalize = lambda t, mean, std, inplace=False: t
    tv_transforms.functional = tv_functional
    tv_models = types.ModuleType("torchvision.models")

    def _no_weights(*a, **k):
        raise RuntimeError("torchvision absent")

    for _name in ("vgg16", "vgg19", "resnet18", "VGG19_Weights", "VGG16_Weights", "ResNet18_Weights", "vgg", "resnet"):
        setattr(tv_models, _name, _no_weights)
    tv_models.VGG19_Weights = types.SimpleNamespace(DEFAULT=None, IMAGENET1K_V1=None)
    tv_models.VGG16_Weights = types.SimpleNamespace(DEFAULT=None, IMAGENET1K_V1=None)
    tv_models.ResNet18_Weights = types.SimpleNamespace(DEFAULT=None, IMAGENET1K_V1=None)
    tv.models = tv_models
    tv.utils = tv_utils
    tv.transforms = tv_transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.utils"] = tv_utils
    sys.modules["torchvision.transforms"] = tv_transforms
    sys.modules["torchvision.transforms.functional"] = tv_functional


def _load_ref_module(name: str):
    """Load a single reference loss file by path, bypassing neosr's package
    __init__ (which imports the whole world, incl. absent deps, and parses
    sys.argv at import time — SURVEY.md §1 wart)."""
    import importlib.util

    if "neosr" not in sys.modules:
        neosr_pkg = types.ModuleType("neosr")
        neosr_pkg.__path__ = []
        utils_pkg = types.ModuleType("neosr.utils")
        utils_pkg.__path__ = []
        registry_mod = types.ModuleType("neosr.utils.registry")

        class _FakeRegistry:
            def register(self, obj=None, suffix=None):
                if obj is None:
                    return lambda f: f
                return obj

        registry_mod.LOSS_REGISTRY = _FakeRegistry()
        registry_mod.ARCH_REGISTRY = _FakeRegistry()
        registry_mod.METRIC_REGISTRY = _FakeRegistry()
        losses_pkg = types.ModuleType("neosr.losses")
        losses_pkg.__path__ = []
        sys.modules["neosr"] = neosr_pkg
        sys.modules["neosr.utils"] = utils_pkg
        sys.modules["neosr.utils.registry"] = registry_mod
        sys.modules["neosr.losses"] = losses_pkg

    full = f"neosr.losses.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, f"/root/reference/neosr/losses/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(3)
    a = rng.random((2, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    return a, b


def _t(x):  # NHWC numpy -> NCHW torch
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def test_l1_mse_huber_chc_parity(imgs):
    ref = _load_ref_module("basic_loss")

    from neosr_tpu.losses import basic_loss as ours

    a, b = imgs
    ta, tb = _t(a), _t(b)
    for ref_cls, our_cls, kw in [
        (ref.L1Loss, ours.L1Loss, {}),
        (ref.MSELoss, ours.MSELoss, {}),
        (ref.HuberLoss, ours.HuberLoss, {"delta": 0.5}),
        (ref.chc_loss, ours.chc_loss, {"criterion": "huber", "loss_lambda": 0.02}),
        (ref.chc_loss, ours.chc_loss, {"criterion": "l1"}),
    ]:
        want = float(ref_cls(**kw)(ta, tb))
        got = float(our_cls(**kw)(a, b))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_mssim_parity(imgs):
    ref_mssim = _load_ref_module("ssim_loss").mssim_loss

    from neosr_tpu.losses.ssim_loss import mssim_loss as our_mssim

    a, b = imgs
    want = float(ref_mssim()(_t(a), _t(b)))
    got = float(our_mssim()(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ldl_parity(imgs):
    _load_ref_module("basic_loss")
    ref_ldl = _load_ref_module("ldl_loss").ldl_loss

    from neosr_tpu.losses.ldl_loss import ldl_loss as our_ldl

    a, b = imgs
    want = float(ref_ldl(criterion="chc")(_t(a), _t(b)))
    got = float(our_ldl(criterion="chc")(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_ff_parity(imgs):
    ref_ff = _load_ref_module("ff_loss").ff_loss

    from neosr_tpu.losses.ff_loss import ff_loss as our_ff

    a, b = imgs
    want = float(ref_ff()(_t(a), _t(b)))
    got = float(our_ff()(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_gan_loss_parity(imgs):
    ref_gan = _load_ref_module("gan_loss").gan_loss

    from neosr_tpu.losses.gan_loss import gan_loss as our_gan

    rng = np.random.default_rng(5)
    logits = rng.normal(0, 2, (2, 8, 8, 1)).astype(np.float32)
    tl = _t(logits)
    for gan_type in ("bce", "mse", "huber"):
        for target_is_real in (True, False):
            for is_disc in (True, False):
                want = float(
                    ref_gan(gan_type=gan_type, loss_weight=0.3)(tl, target_is_real, is_disc)
                )
                got = float(
                    our_gan(gan_type=gan_type, loss_weight=0.3)(logits, target_is_real, is_disc)
                )
                np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gw_loss_runs(imgs):
    # reference gw has a kernel-aliasing bug (45/135 use 0/90 kernels) that we
    # intentionally fix, so only sanity-check behavior, not parity.
    from neosr_tpu.losses.gw_loss import gw_loss

    a, b = imgs
    val = float(gw_loss()(a, b))
    assert np.isfinite(val) and val > 0
    assert float(gw_loss()(a, a)) == pytest.approx(0.0, abs=1e-7)


def test_consistency_loss_runs(imgs):
    # reference version needs torchvision (absent) -> behavioral checks only
    from neosr_tpu.losses.consistency_loss import consistency_loss

    a, b = imgs
    val = float(consistency_loss()(a, b))
    assert np.isfinite(val) and val > 0
    same = float(consistency_loss()(a, a))
    assert same == pytest.approx(0.0, abs=1e-5)


def test_discriminators_shapes():
    import jax
    import jax.numpy as jnp

    from neosr_tpu.archs import build_network

    x = jnp.zeros((2, 32, 32, 3))
    d = build_network({"type": "unet"})
    p = jax.jit(d.init)(jax.random.key(0), x)
    y = jax.jit(d.apply)(p, x)
    assert y.shape == (2, 32, 32, 1)

    d2 = build_network({"type": "patchgan"})
    p2 = jax.jit(d2.init)(jax.random.key(0), x)
    y2 = jax.jit(d2.apply)(p2, x)
    assert y2.shape[0] == 2 and y2.shape[-1] == 1


def test_gw_loss_parity(imgs):
    """Exact parity with the reference (incl. its 45/135 kernel aliasing)."""
    _load_ref_module("basic_loss")  # gw_loss imports chc_loss from it
    ref = _load_ref_module("gw_loss")

    from neosr_tpu.losses.gw_loss import gw_loss

    a, b = imgs
    ta, tb = _t(a), _t(b)
    for kw in ({"corner": True}, {"corner": False}, {"criterion": "l1"}):
        want = float(ref.gw_loss(**kw)(ta, tb))
        got = float(gw_loss(**kw)(a, b))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_consistency_loss_parity(imgs):
    """Parity vs the reference with a faithful GaussianBlur(21, 3) stub
    (separable gaussian, reflect padding — torchvision semantics)."""
    import math

    import torchvision.transforms as tvt

    def _gaussian_blur_factory(ksize, sigma):
        k = torch.arange(ksize, dtype=torch.float32) - (ksize - 1) / 2
        g = torch.exp(-(k**2) / (2 * sigma**2))
        g = g / g.sum()

        class _GB:
            def __call__(self, x):
                c = x.shape[1]
                pad = ksize // 2
                xp = torch.nn.functional.pad(x, (pad, pad, pad, pad),
                                             mode="reflect")
                kh = g.view(1, 1, ksize, 1).expand(c, 1, ksize, 1)
                kw_ = g.view(1, 1, 1, ksize).expand(c, 1, 1, ksize)
                xp = torch.nn.functional.conv2d(xp, kh, groups=c)
                return torch.nn.functional.conv2d(xp, kw_, groups=c)

        return _GB()

    real_gb = tvt.GaussianBlur
    tvt.GaussianBlur = lambda k, s: _gaussian_blur_factory(k, s)
    try:
        _load_ref_module("basic_loss")
        ref = _load_ref_module("consistency_loss")
        from neosr_tpu.losses.consistency_loss import consistency_loss

        a, b = imgs
        ta, tb = _t(a), _t(b)
        for kw in ({}, {"blur": True}, {"cosim": True}):
            want = float(ref.consistency_loss(**kw)(ta, tb))
            got = float(consistency_loss(**kw)(a, b))
            np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
    finally:
        tvt.GaussianBlur = real_gb


def test_dists_accumulate_stages_flag(imgs):
    """accumulate_stages=True restores the published cross-stage DISTS sum;
    the default replicates the reference's per-stage reset (last stage
    wins, reference dists_loss.py:148-162)."""
    import jax.numpy as jnp

    from neosr_tpu.losses.dists_loss import dists_loss

    a, b = imgs
    x = jnp.asarray(a).astype(jnp.float32)
    y = jnp.asarray(b).astype(jnp.float32)
    ref_mode = dists_loss(as_loss=True, load_weights=False)
    acc_mode = dists_loss(as_loss=True, load_weights=False, accumulate_stages=True)
    v_ref = float(ref_mode(x, y))
    v_acc = float(acc_mode(x, y))
    assert v_ref != v_acc  # accumulation changes the score
    # identical inputs: accumulated mode sums normalized weights over ALL
    # stages (= 1) so self-distance ~0; reset mode keeps only the last
    # stage's weight share, so its self-distance is strictly positive —
    # exactly the deviation from published DISTS the flag exists to fix
    assert abs(float(acc_mode(x, x))) < 1e-3
    assert float(ref_mode(x, x)) > 0.1
