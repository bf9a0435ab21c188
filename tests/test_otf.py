"""OTF pipeline tests: kernel-generator parity vs the reference, fused
device degradation smoke, pool/augmentations, end-to-end otf training."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _load_ref_degradations():
    """Path-load the reference degradations module with stubbed deps."""
    import importlib.util

    if "ref_degradations" in sys.modules:
        return sys.modules["ref_degradations"]

    # stub torchvision.rgb_to_grayscale + neosr.utils.rng
    from tests import test_losses  # noqa: F401  (installs torchvision stubs)

    rng_mod = types.ModuleType("neosr.utils.rng")
    rng_mod.rng = lambda: np.random.default_rng(0)
    sys.modules.setdefault("neosr", types.ModuleType("neosr")).__path__ = []
    utils_mod = sys.modules.setdefault("neosr.utils", types.ModuleType("neosr.utils"))
    utils_mod.__path__ = []
    sys.modules["neosr.utils.rng"] = rng_mod

    spec = importlib.util.spec_from_file_location(
        "ref_degradations", "/root/reference/neosr/data/degradations.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_degradations"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_kernel_generators_parity():
    ref = _load_ref_degradations()

    from neosr_tpu.data import degradations as ours

    for iso in (True, False):
        want = ref.bivariate_Gaussian(17, 1.7, 0.8, 0.6, isotropic=iso)
        got = ours.bivariate_Gaussian(17, 1.7, 0.8, 0.6, isotropic=iso)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

        want = ref.bivariate_generalized_Gaussian(21, 2.0, 1.0, -0.3, 1.5, isotropic=iso)
        got = ours.bivariate_generalized_Gaussian(21, 2.0, 1.0, -0.3, 1.5, isotropic=iso)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

        want = ref.bivariate_plateau(15, 1.0, 2.0, 0.2, 1.2, isotropic=iso)
        got = ours.bivariate_plateau(15, 1.0, 2.0, 0.2, 1.2, isotropic=iso)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    want = ref.circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)
    got = ours.circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_fused_degradation_pipeline():
    import jax
    import jax.numpy as jnp

    from neosr_tpu.data.degradations import pulse_tensor
    from neosr_tpu.data.otf_device import make_degradation_fn

    cfg = {
        "resize_prob": [0.3, 0.4, 0.3], "resize_range": [0.5, 1.5],
        "gaussian_noise_prob": 0.5, "noise_range": [1, 15],
        "poisson_scale_range": [0.05, 0.5], "gray_noise_prob": 0.3,
        "jpeg_range": [40, 95],
        "second_blur_prob": 0.5,
        "resize_prob2": [0.3, 0.4, 0.3], "resize_range2": [0.3, 1.5],
        "gaussian_noise_prob2": 0.5, "noise_range2": [1, 10],
        "poisson_scale_range2": [0.05, 0.25], "gray_noise_prob2": 0.3,
        "jpeg_range2": [40, 95],
    }
    gt_size, scale, patch, b = 64, 4, 8, 2
    fn = make_degradation_fn(cfg, scale, gt_size, patch)

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.random((b, gt_size, gt_size, 3)).astype(np.float32))
    k = np.zeros((b, 21, 21), np.float32)
    k[:, 10, 10] = 1.0  # identity kernels
    sk = jnp.asarray(np.stack([pulse_tensor(21)] * b))

    for seed in range(4):
        gt_p, lq_p = fn(gt, jnp.asarray(k), jnp.asarray(k), sk, jax.random.key(seed))
        assert gt_p.shape == (b, patch * scale, patch * scale, 3)
        assert lq_p.shape == (b, patch, patch, 3)
        lq_np = np.asarray(lq_p)
        assert np.isfinite(lq_np).all()
        assert 0.0 <= lq_np.min() and lq_np.max() <= 1.0
        # lq must be on the 8-bit lattice (clamp/round parity, otf.py:251)
        np.testing.assert_allclose(lq_np * 255, np.round(lq_np * 255), atol=1e-4)
        # degraded lq should still correlate with downscaled gt
        assert lq_np.std() > 0.01


def test_augmentations():
    import jax
    import jax.numpy as jnp

    from neosr_tpu.data.augmentations import apply_augment, cutblur, cutmix, mixup, resizemix

    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.random((4, 32, 32, 3)).astype(np.float32))
    lq_hr = jnp.asarray(rng.random((4, 32, 32, 3)).astype(np.float32))

    for fn in (mixup, cutmix, resizemix, cutblur):
        g2, l2 = fn(gt, lq_hr, jax.random.key(0))
        assert g2.shape == gt.shape and l2.shape == lq_hr.shape
        assert np.isfinite(np.asarray(g2)).all()

    lq = jnp.asarray(rng.random((4, 8, 8, 3)).astype(np.float32))
    g3, l3 = apply_augment(
        gt, lq, scale=4,
        augs=("none", "mixup", "cutmix", "resizemix", "cutblur"),
        prob=(0.2, 0.2, 0.2, 0.2, 0.2),
        key=jax.random.key(1), np_rng=np.random.default_rng(2),
    )
    assert g3.shape == gt.shape
    assert l3.shape == lq.shape


def test_otf_end_to_end(tiny_paired_dataset, tmp_path):
    from tests.test_smoke_train import make_opt

    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    opt = make_opt(tiny_paired_dataset, tmp_path)
    opt["model_type"] = "otf"
    opt["datasets"]["train"] = {
        "type": "otf", "phase": "train",
        "dataroot_gt": tiny_paired_dataset["gt"],
        "gt_size": 64, "patch_size": 8, "batch_size": 2,
        "queue_size": 4,
        "augmentation": ["none", "mixup", "cutmix", "resizemix", "cutblur"],
        "aug_prob": [0.4, 0.15, 0.15, 0.15, 0.15],
        "scale": 4, "seed": 0,
        # degradations
        "resize_prob": [0.3, 0.4, 0.3], "resize_range": [0.5, 1.5],
        "gaussian_noise_prob": 0.5, "noise_range": [1, 15],
        "poisson_scale_range": [0.05, 0.5], "gray_noise_prob": 0.3,
        "jpeg_range": [40, 95], "second_blur_prob": 0.5,
        "resize_prob2": [0.3, 0.4, 0.3], "resize_range2": [0.3, 1.5],
        "gaussian_noise_prob2": 0.5, "noise_range2": [1, 10],
        "poisson_scale_range2": [0.05, 0.25], "gray_noise_prob2": 0.3,
        "jpeg_range2": [40, 95],
        "blur_kernel_size": 7, "blur_kernel_size2": 9,
        "kernel_list": ["iso", "aniso"], "kernel_prob": [0.7, 0.3],
        "kernel_list2": ["iso", "aniso"], "kernel_prob2": [0.7, 0.3],
        "sinc_prob": 0.1, "sinc_prob2": 0.1, "final_sinc_prob": 0.8,
    }

    train_set = build_dataset(opt["datasets"]["train"])
    sample = train_set[0]
    assert sample["gt"].shape == (64, 64, 3)
    assert sample["kernel1"].shape == (21, 21)

    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt["datasets"]["train"], num_devices=1, sampler=sampler, seed=7
    )
    model = build_model(opt)
    it = iter(loader)
    losses = []
    for i in range(4):
        model.feed_data(next(it))
        model.optimize_parameters(i + 1)
        losses.append(model.get_current_log()["l_g_total"])
    loader.close()
    assert model._fused_step is not None  # augs now fuse too (traced selection)
    assert np.isfinite(losses).all()


def _otf_train_opts(tiny_paired_dataset, tmp_path, batch):
    from tests.test_smoke_train import make_opt

    opt = make_opt(tiny_paired_dataset, tmp_path)
    opt["model_type"] = "otf"
    opt["datasets"]["train"] = {
        "type": "otf", "phase": "train",
        "dataroot_gt": tiny_paired_dataset["gt"],
        "gt_size": 64, "patch_size": 8, "batch_size": batch,
        "queue_size": batch * 2, "scale": 4, "seed": 0,
        "resize_prob": [0.3, 0.4, 0.3], "resize_range": [0.5, 1.5],
        "gaussian_noise_prob": 0.5, "noise_range": [1, 15],
        "poisson_scale_range": [0.05, 0.5], "gray_noise_prob": 0.3,
        "jpeg_range": [40, 95], "second_blur_prob": 0.5,
        "resize_prob2": [0.3, 0.4, 0.3], "resize_range2": [0.3, 1.5],
        "gaussian_noise_prob2": 0.5, "noise_range2": [1, 10],
        "poisson_scale_range2": [0.05, 0.25], "gray_noise_prob2": 0.3,
        "jpeg_range2": [40, 95],
        "blur_kernel_size": 7, "blur_kernel_size2": 9,
        "kernel_list": ["iso", "aniso"], "kernel_prob": [0.7, 0.3],
        "kernel_list2": ["iso", "aniso"], "kernel_prob2": [0.7, 0.3],
        "sinc_prob": 0.1, "sinc_prob2": 0.1, "final_sinc_prob": 0.8,
    }
    return opt


def test_otf_fused_single_program(tiny_paired_dataset, tmp_path):
    """No augmentations -> the fused degrade+pool+train XLA program runs."""
    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    opt = _otf_train_opts(tiny_paired_dataset, tmp_path, batch=2)
    train_set = build_dataset(opt["datasets"]["train"])
    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt["datasets"]["train"], num_devices=1, sampler=sampler, seed=7
    )
    model = build_model(opt)
    it = iter(loader)
    losses = []
    for i in range(5):  # covers pool fill (q=4: 2 iters) AND swap phases
        model.feed_data(next(it))
        model.optimize_parameters(i + 1)
        losses.append(model.get_current_log()["l_g_total"])
    loader.close()
    assert model._fused_step is not None
    assert int(model._pool_ptr) == 4  # pool filled, then swapping
    assert np.isfinite(losses).all()


def test_otf_fused_multichip(tiny_paired_dataset, tmp_path):
    """Fused OTF step shards the batch over an 8-device mesh."""
    import jax

    from neosr_tpu.data import build_dataset
    from neosr_tpu.data.loader import collate
    from neosr_tpu.models import build_model

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 fake devices")
    opt = _otf_train_opts(tiny_paired_dataset, tmp_path, batch=1)
    opt["num_gpu"] = 8
    train_set = build_dataset(opt["datasets"]["train"])
    model = build_model(opt)
    batch = collate([train_set[i] for i in range(8)])
    for i in range(3):
        model.feed_data(batch)
        model.optimize_parameters(i + 1)
    assert np.isfinite(model.get_current_log()["l_g_total"])


def test_traced_augment_fn():
    """make_augment_fn jits standalone and covers every aug combination."""
    import jax
    import jax.numpy as jnp

    from neosr_tpu.data.augmentations import make_augment_fn

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.random((4, 32, 32, 3), np.float32))
    lq = jnp.asarray(rng.random((4, 8, 8, 3), np.float32))
    fn = jax.jit(make_augment_fn(
        4, ("none", "mixup", "cutmix", "resizemix", "cutblur"),
        (0.2, 0.2, 0.2, 0.2, 0.2),
    ))
    changed = 0
    for i in range(8):
        g2, l2 = fn(gt, lq, jax.random.key(i))
        assert g2.shape == gt.shape and l2.shape == lq.shape
        assert np.isfinite(np.asarray(g2)).all() and np.isfinite(np.asarray(l2)).all()
        changed += int(not np.allclose(np.asarray(g2), np.asarray(gt)))
    assert changed >= 3  # selection actually varies across keys


def test_poisson_fast_sampler_statistics():
    """The fixed-op-count Poisson sampler (TPU replacement for
    jax.random.poisson's while-loop rejection) must match Poisson
    mean/variance/skewness across the pipeline's rate range, and be
    exact-in-distribution for small rates."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neosr_tpu.data.otf_device import _poisson_fast

    n = 200_000
    for lam_v in (0.0, 0.5, 2.0, 7.0, 9.0, 32.0, 128.0, 256.0):
        lam = jnp.full((n,), lam_v, jnp.float32)
        x = np.asarray(_poisson_fast(jax.random.key(int(lam_v * 10) + 1), lam))
        assert (x >= 0).all()
        se_mean = max(np.sqrt(lam_v / n), 1e-4)
        assert abs(x.mean() - lam_v) < 6 * se_mean + 0.05, (lam_v, x.mean())
        if lam_v > 0:
            assert abs(x.var() / lam_v - 1) < 0.05, (lam_v, x.var())
            skew = ((x - x.mean()) ** 3).mean() / x.var() ** 1.5
            assert abs(skew - lam_v ** -0.5) < 0.1, (lam_v, skew)
    # small-lambda branch is exact inverse-CDF: compare full pmf
    lam_v = 3.0
    lam = jnp.full((n,), lam_v, jnp.float32)
    x = np.asarray(_poisson_fast(jax.random.key(99), lam)).astype(int)
    from math import exp, factorial
    for k in range(10):
        p_emp = (x == k).mean()
        p_true = exp(-lam_v) * lam_v**k / factorial(k)
        assert abs(p_emp - p_true) < 4 * np.sqrt(p_true * (1 - p_true) / n) + 1e-4
