"""GAN-mode training smoke: G losses + D real/fake step + EMA in one jitted
step (reference closure semantics, image.py:427-662)."""

import numpy as np


def test_gan_train_step(tiny_paired_dataset, tmp_path):
    from tests.test_smoke_train import make_opt

    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        extra_train={
            "gan_opt": {"type": "gan_loss", "gan_type": "bce", "loss_weight": 0.3},
            "mssim_opt": {"type": "mssim_loss", "loss_weight": 1.0},
            "optim_d": {"type": "adamw", "lr": 5e-4},
        },
    )
    opt["network_d"] = {"type": "unet", "num_feat": 16}
    opt["datasets"]["train"]["patch_size"] = 12  # mssim needs >= 11px at scale 0

    model = build_model(opt)
    assert model.net_d is not None

    train_set = build_dataset(opt["datasets"]["train"])
    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt["datasets"]["train"], num_devices=1, sampler=sampler, seed=7
    )
    it = iter(loader)
    for i in range(3):
        model.feed_data(next(it))
        model.optimize_parameters(i + 1)
    logs = model.get_current_log()
    loader.close()

    for key in ("l_g_pixel", "l_g_mssim", "l_g_gan", "l_g_total", "l_d_real", "l_d_fake"):
        assert key in logs, f"missing {key}: {logs.keys()}"
        assert np.isfinite(logs[key])


def test_gan_train_step_sn_update_once(tiny_paired_dataset, tmp_path):
    """sn_update_once runs the SN power iteration only in the D-step's real
    apply; the fake apply reuses stored u/v (making its forward HLO-identical
    to the G-step's, which XLA CSEs away).  Losses must stay finite and the
    first step — where stored u/v equal the init for both modes' G-step —
    must produce the same l_g_* values as the default cadence."""
    from tests.test_smoke_train import make_opt

    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    logs_by_mode = {}
    for sn_once in (False, True):
        opt = make_opt(
            tiny_paired_dataset, tmp_path,
            extra_train={
                "gan_opt": {"type": "gan_loss", "gan_type": "bce",
                            "loss_weight": 0.3},
                "optim_d": {"type": "adamw", "lr": 5e-4},
                "sn_update_once": sn_once,
            },
        )
        opt["name"] = f"gan_sn_once_{sn_once}"
        opt["network_d"] = {"type": "unet", "num_feat": 16}

        model = build_model(opt)
        train_set = build_dataset(opt["datasets"]["train"])
        sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
        loader = build_dataloader(
            train_set, opt["datasets"]["train"], num_devices=1,
            sampler=sampler, seed=7,
        )
        it = iter(loader)
        step_logs = []
        for i in range(3):
            model.feed_data(next(it))
            model.optimize_parameters(i + 1)
            step_logs.append(model.get_current_log())
        loader.close()
        logs_by_mode[sn_once] = step_logs

    for step_logs in logs_by_mode.values():
        for logs in step_logs:
            for key in ("l_g_gan", "l_d_real", "l_d_fake"):
                assert np.isfinite(logs[key])
    # step 1: stored u/v identical across modes -> identical G losses and
    # identical l_d_real (the real apply is unchanged)
    for key in ("l_g_gan", "l_g_total", "l_d_real"):
        np.testing.assert_allclose(
            logs_by_mode[True][0][key], logs_by_mode[False][0][key],
            rtol=1e-5, atol=1e-6, err_msg=key,
        )


def test_param_storage_bf16_probe(tiny_paired_dataset, tmp_path, monkeypatch):
    """NEOSR_PARAM_STORAGE=bf16 is a bench-only probe: params (and hence
    optimizer state + EMA) live in bf16 storage.  The step must run with
    finite losses and the stored params must actually be bf16."""
    import jax.numpy as jnp

    from tests.test_smoke_train import make_opt

    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    monkeypatch.setenv("NEOSR_PARAM_STORAGE", "bf16")
    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        extra_train={
            "gan_opt": {"type": "gan_loss", "gan_type": "bce", "loss_weight": 0.3},
            "optim_d": {"type": "adamw", "lr": 5e-4},
        },
    )
    opt["name"] = "gan_param_bf16_probe"
    opt["network_d"] = {"type": "unet", "num_feat": 16}
    opt["use_amp"] = True

    model = build_model(opt)
    import jax

    leaves = jax.tree.leaves(model.state.params_g)
    assert all(p.dtype == jnp.bfloat16 for p in leaves if p.dtype != jnp.int32)

    train_set = build_dataset(opt["datasets"]["train"])
    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt["datasets"]["train"], num_devices=1, sampler=sampler, seed=7
    )
    it = iter(loader)
    for i in range(2):
        model.feed_data(next(it))
        model.optimize_parameters(i + 1)
    logs = model.get_current_log()
    loader.close()
    for key in ("l_g_pixel", "l_g_gan", "l_d_real", "l_d_fake"):
        assert np.isfinite(logs[key]), key


def test_gan_requires_discriminator(tiny_paired_dataset, tmp_path):
    import pytest

    from tests.test_smoke_train import make_opt

    from neosr_tpu.models import build_model

    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        extra_train={"gan_opt": {"type": "gan_loss"}},
    )
    with pytest.raises(ValueError, match="network_d"):
        build_model(opt)


def test_error_walls(tiny_paired_dataset, tmp_path):
    """Config error wall parity (reference image.py:241-294)."""
    import pytest

    from tests.test_smoke_train import make_opt

    from neosr_tpu.models import build_model

    # optim_d without network_d
    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        extra_train={"optim_d": {"type": "adamw", "lr": 5e-4}},
    )
    with pytest.raises(ValueError, match="optim_d"):
        build_model(opt)

    # wavelet_guided without GAN
    opt = make_opt(
        tiny_paired_dataset, tmp_path, extra_train={"wavelet_guided": True},
    )
    with pytest.raises(ValueError, match="wavelet_guided"):
        build_model(opt)

    # ea2fpn at patch 48 / scale 1
    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        extra_train={
            "gan_opt": {"type": "gan_loss", "gan_type": "bce", "loss_weight": 0.3},
            "optim_d": {"type": "adamw", "lr": 5e-4},
        },
    )
    opt["scale"] = 1
    opt["network_d"] = {"type": "ea2fpn"}
    opt["datasets"]["train"]["patch_size"] = 48
    with pytest.raises(ValueError, match="ea2fpn"):
        build_model(opt)


def test_unknown_loss_opt_errors(tiny_paired_dataset, tmp_path):
    """An unrecognized *_opt key (e.g. the phantom fdl_opt) must hit the
    config wall, not warn-skip (VERDICT r2 #9)."""
    import pytest

    from tests.test_smoke_train import make_opt

    from neosr_tpu.models import build_model

    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        extra_train={"fdl_opt": {"type": "fdl_loss", "loss_weight": 1.0}},
    )
    with pytest.raises(ValueError, match="fdl_opt"):
        build_model(opt)

    # unknown TYPE inside a known _opt key errors too (registry KeyError)
    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        extra_train={"pixel_opt": {"type": "NoSuchLoss", "loss_weight": 1.0}},
    )
    with pytest.raises(KeyError, match="NoSuchLoss"):
        build_model(opt)


def test_symlet_filter_bank():
    """The in-repo least-asymmetric factorization (used for wavelet_guided
    when pywt is absent) must reproduce the published symN family: sym4
    equals pywt's coefficient table, and sym19 is orthonormal with
    near-linear phase (far below the extremal-phase db19 deviation)."""
    import numpy as np

    from neosr_tpu.losses.wavelet_guided import (
        _phase_nonlinearity,
        daubechies_filters,
        symlet_filters,
    )

    # pywt.Wavelet("sym4").dec_lo — public reference table
    sym4_dec_lo = [
        -0.07576571478927333, -0.02963552764599851, 0.49761866763201545,
        0.8037387518059161, 0.29785779560527736, -0.09921954357684722,
        -0.012603967262037833, 0.0322231006040427,
    ]
    lo4, _ = symlet_filters(4)
    np.testing.assert_allclose(lo4, sym4_dec_lo, atol=1e-10)

    lo, hi = symlet_filters(19)
    assert len(lo) == 38
    np.testing.assert_allclose(lo.sum(), np.sqrt(2.0), atol=1e-9)
    np.testing.assert_allclose(np.dot(lo, lo), 1.0, atol=1e-9)
    for m in (1, 2, 3):
        assert abs(np.dot(lo[: len(lo) - 2 * m], lo[2 * m:])) < 1e-9
    for p in (0, 1, 2):
        assert abs(np.dot(np.arange(len(hi), dtype=np.float64) ** p, hi)) < 1e-9
    db_lo, _ = daubechies_filters(19)
    assert _phase_nonlinearity(lo[::-1]) < _phase_nonlinearity(db_lo[::-1]) / 10


def test_otf_rejects_grayscale():
    import pytest as _pytest

    from neosr_tpu.models.otf import otf

    with _pytest.raises(ValueError, match="color='y'"):
        otf({"color": "y", "datasets": {"train": {}}})
