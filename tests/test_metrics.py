"""Metric conventions: numpy vs on-device parity, and PSNR sanity."""

import numpy as np


def test_psnr_ssim_device_matches_host():
    import jax.numpy as jnp

    from neosr_tpu.metrics.calculate import calculate_psnr, calculate_ssim
    from neosr_tpu.metrics.jax_metrics import psnr_jnp, ssim_jnp

    rng = np.random.default_rng(0)
    a = (rng.random((64, 48, 3)) * 255).astype(np.float64)
    b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255)

    for y in (False, True):
        want = calculate_psnr(a, b, crop_border=4, test_y_channel=y)
        got = float(psnr_jnp(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
                             crop_border=4, test_y_channel=y))
        np.testing.assert_allclose(got, want, rtol=1e-4)

        want_s = calculate_ssim(a, b, crop_border=4, test_y_channel=y)
        got_s = float(ssim_jnp(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
                               crop_border=4, test_y_channel=y))
        np.testing.assert_allclose(got_s, want_s, rtol=1e-3, atol=1e-4)


def test_psnr_identity_and_known_value():
    from neosr_tpu.metrics.calculate import calculate_psnr

    img = (np.random.default_rng(1).random((32, 32, 3)) * 255).astype(np.uint8)
    assert calculate_psnr(img, img, crop_border=0) == float("inf")
    # uniform +16 offset -> PSNR = 20*log10(255/16)
    b = np.clip(img.astype(np.float64) + 16, 0, 255)
    mask = img <= 239  # avoid clipped pixels changing MSE
    if mask.all():
        got = calculate_psnr(img, b, crop_border=0)
        np.testing.assert_allclose(got, 20 * np.log10(255 / 16), rtol=1e-6)


def test_metric_registry_dispatch():
    from neosr_tpu.metrics import calculate_metric

    rng = np.random.default_rng(2)
    a = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    b = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    v = calculate_metric({"img": a, "img2": b}, {"type": "calculate_psnr", "crop_border": 2})
    assert np.isfinite(v)
    v2 = calculate_metric(
        {"img": a, "img2": b}, {"type": "calculate_ssim", "better": "higher"}
    )
    assert -1 <= v2 <= 1
