"""Discriminator (net_d) checkpoint interop vs the reference torch impls.

Import: reference `.pth` state_dicts (unet_arch.py:9-67 Real-ESRGAN U-Net,
patchgan_arch.py:34-146 pix2pixHD PatchGAN) -> our flax params, with
torch's persistent spectral-norm power-iteration buffers (weight_u/v)
carried into the batch_stats collection.  Export: our params (+ stored
u/v) -> reference torch key layout, strict load.  Eval-mode outputs match
exactly because both sides normalize by the SAME stored estimate
sigma = u^T W v (SNConv stateful mode, discriminators.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_torch_interop import _load_ref_arch, _state_dict_np  # noqa: E402

from neosr_tpu.archs import build_network  # noqa: E402
from neosr_tpu.utils.torch_interop import (  # noqa: E402
    convert_state_dict,
    to_torch_state_dict,
)


@pytest.fixture()
def x():
    # spatial size divisible by 8 for the U-Net's 3 stride-2 stages
    return np.random.default_rng(7).random((2, 32, 32, 3)).astype(np.float32)


def _ours(our_type: str, kwargs: dict, sd: dict, x_nhwc: np.ndarray) -> np.ndarray:
    params, bstats = convert_state_dict(sd, our_type, with_stats=True)
    net = build_network({"type": our_type, **kwargs}, scale=4)
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    out = jax.jit(lambda v, y: net.apply(v, y))(variables, jnp.asarray(x_nhwc))
    return np.asarray(out)


def _burn_in(m: torch.nn.Module, x_bchw: torch.Tensor, iters: int = 5) -> None:
    """A few train-mode forwards so the torch u/v buffers hold a realistic
    (partially converged) estimate — the imported values must reproduce it
    regardless of convergence."""
    m.train()
    with torch.no_grad():
        for _ in range(iters):
            m(x_bchw)
    m.eval()


def test_unet_pth_import_exact(x):
    mod = _load_ref_arch("unet_arch")
    m = mod.unet(num_feat=32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    _burn_in(m, xt)
    with torch.no_grad():
        theirs = m(xt).numpy().transpose(0, 2, 3, 1)
    ours = _ours("unet", {"num_feat": 32}, _state_dict_np(m), x)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_unet_import_keys_exact(x):
    mod = _load_ref_arch("unet_arch")
    m = mod.unet(num_feat=16)
    sd = _state_dict_np(m)
    params, bstats = convert_state_dict(sd, "unet", with_stats=True)
    np.testing.assert_array_equal(
        params["SNConv_3"]["kernel"],
        sd["conv4.weight_orig"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(bstats["SNConv_3"]["u"], sd["conv4.weight_u"])
    np.testing.assert_array_equal(params["Conv_1"]["bias"], sd["conv9.bias"])


@pytest.mark.parametrize("num_layers", [2, 3])
def test_patchgan_pth_import_exact(x, num_layers):
    mod = _load_ref_arch("patchgan_arch")
    m = mod.patchgan(num_feat=16, num_layers=num_layers)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    _burn_in(m, xt)
    with torch.no_grad():
        theirs = m(xt).numpy().transpose(0, 2, 3, 1)
    ours = _ours("patchgan", {"num_feat": 16, "num_layers": num_layers},
                 _state_dict_np(m), x)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_patchgan_no_sn_exact(x):
    mod = _load_ref_arch("patchgan_arch")
    m = mod.patchgan(num_feat=16, use_sn=False).eval()
    with torch.no_grad():
        theirs = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = _ours("patchgan", {"num_feat": 16, "use_sn": False},
                 _state_dict_np(m), x)
    np.testing.assert_allclose(
        ours, theirs.numpy().transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4
    )


def test_patchgan_norm_layers_rejected():
    mod = _load_ref_arch("patchgan_arch")
    m = mod.patchgan(num_feat=8, norm_type="batchnorm2d", use_sn=False)
    with pytest.raises(ValueError, match="norm"):
        convert_state_dict(_state_dict_np(m), "patchgan")


@pytest.mark.parametrize("family", ["unet", "patchgan"])
def test_discriminator_pth_export_roundtrip(x, family):
    """Random flax D (params + stored u/v) -> torch layout -> strict load
    into the reference module -> identical eval logits."""
    mod = _load_ref_arch(f"{family}_arch")
    kwargs = {"num_feat": 16}
    net = build_network({"type": family, **kwargs}, scale=4)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = to_torch_state_dict(
        jax.device_get(variables["params"]), family,
        batch_stats=jax.device_get(variables["batch_stats"]),
    )
    m = getattr(mod, family)(**kwargs)
    m.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
                      strict=True)
    m.eval()
    with torch.no_grad():
        theirs = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = jax.jit(lambda v, y: net.apply(v, y))(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
        atol=2e-5, rtol=1e-4,
    )


def test_sn_train_step_updates_uv(x):
    """A mutable apply performs exactly one torch-style power iteration."""
    net = build_network({"type": "unet", "num_feat": 16}, scale=4)
    variables = net.init(jax.random.PRNGKey(1), jnp.asarray(x))
    _, mut = net.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
    k = np.asarray(variables["params"]["SNConv_0"]["kernel"], np.float64)
    m = k.reshape(-1, k.shape[-1])
    u0 = np.asarray(variables["batch_stats"]["SNConv_0"]["u"], np.float64)
    v1 = m @ u0
    v1 /= np.linalg.norm(v1) + 1e-12
    u1 = m.T @ v1
    u1 /= np.linalg.norm(u1) + 1e-12
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["SNConv_0"]["u"]), u1, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["SNConv_0"]["v"]), v1, atol=1e-5)
