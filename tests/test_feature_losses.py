"""VGG perceptual / DISTS / wavelet-guided tests."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def imgs():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    return a, b


def test_perceptual_loss(imgs):
    from neosr_tpu.losses import build_loss

    a, b = imgs
    loss = build_loss({"type": "vgg_perceptual_loss", "loss_weight": 0.5,
                       "criterion": "chc", "scale": 4})
    v = float(loss(a, b))
    assert np.isfinite(v) and v > 0
    assert float(loss(a, a)) == pytest.approx(0.0, abs=1e-4)

    import jax.numpy as jnp

    loss2 = build_loss({"type": "vgg_perceptual_loss", "loss_weight": 0.5,
                        "criterion": "chc", "patchloss": True, "ipk": True,
                        "scale": 4})
    rng = np.random.default_rng(0)
    big_a = jnp.asarray(rng.random((1, 128, 128, 3)), jnp.float32)
    big_b = jnp.asarray(rng.random((1, 128, 128, 3)), jnp.float32)
    assert np.isfinite(float(loss2(big_a, big_b)))


def test_dists_loss_and_metric(imgs):
    from neosr_tpu.losses import build_loss
    from neosr_tpu.losses.dists_loss import calculate_dists

    a, b = imgs
    loss = build_loss({"type": "dists_loss"})
    v = float(loss(a, b))
    assert np.isfinite(v)
    assert float(loss(a, a)) == pytest.approx(0.0, abs=1e-5)
    m = calculate_dists(np.asarray(a[0]) * 255, np.asarray(b[0]) * 255)
    assert np.isfinite(m)


def test_dists_alpha_beta_bundled():
    from pathlib import Path

    import neosr_tpu.losses.dists_loss as dl

    assert Path(dl._DEFAULT_ALPHA_BETA).exists()
    ab = np.load(dl._DEFAULT_ALPHA_BETA)
    assert ab["alpha"].size == sum(dl._CHNS)


def test_wavelet_guided_bands(imgs):
    import jax

    from neosr_tpu.losses.wavelet_guided import daubechies_filters, wavelet_guided

    lo, hi = daubechies_filters(2)
    np.testing.assert_allclose(
        lo, [-0.12940952, 0.22414387, 0.83651630, 0.48296291], atol=1e-6
    )
    a, b = imgs
    hf_sr, hf_gt = jax.jit(wavelet_guided)(a, b)
    assert hf_sr.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(hf_sr)).all()
    # gt path must carry no gradient; sr path must
    g = jax.grad(lambda x: jax.jit(wavelet_guided)(x, b)[0].sum())(a)
    assert np.abs(np.asarray(g)).max() > 0


def test_wavelet_gan_training(tiny_paired_dataset, tmp_path):
    from tests.test_smoke_train import make_opt

    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        extra_train={
            "gan_opt": {"type": "gan_loss", "gan_type": "bce", "loss_weight": 0.3},
            "optim_d": {"type": "adamw", "lr": 5e-4},
            "wavelet_guided": True,
            "wavelet_init": 2,
        },
    )
    opt["network_d"] = {"type": "unet", "num_feat": 16}
    train_set = build_dataset(opt["datasets"]["train"])
    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt["datasets"]["train"], num_devices=1, sampler=sampler, seed=7
    )
    model = build_model(opt)
    it = iter(loader)
    for i in range(4):
        model.feed_data(next(it))
        model.optimize_parameters(i + 1)
    logs = model.get_current_log()
    loader.close()
    assert np.isfinite(logs["l_d_real"]) and np.isfinite(logs["l_d_fake"])
