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


# ---------------------------------------------------------------- ea2fpn
def _fake_torchvision():
    """Install a minimal torchvision so the reference ea2fpn_arch imports:
    an honest ResNet18 with torchvision's exact child order and param
    names, random-init (the real package and its ImageNet weights are
    unavailable in this environment)."""
    import sys
    import types

    from torch import nn as tnn

    class _Basic(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idt)

    class _ResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(3)
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(_Basic(64, 64), _Basic(64, 64))
            self.layer2 = tnn.Sequential(_Basic(64, 128, 2), _Basic(128, 128))
            self.layer3 = tnn.Sequential(_Basic(128, 256, 2), _Basic(256, 256))
            self.layer4 = tnn.Sequential(_Basic(256, 512, 2), _Basic(512, 512))
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc = tnn.Linear(512, 1000)

    # augment an existing stub (test_feature_losses installs a VGG-only
    # torchvision; test_losses installs a RAISING resnet18) or install a
    # fresh one — always overriding resnet18 with the working fake
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    tvm = sys.modules["torchvision.models"]

    class _W:
        DEFAULT = None

    tvm.resnet18 = lambda weights=None: _ResNet18()
    tvm.ResNet18_Weights = _W


@pytest.fixture()
def cpu_pinmem(monkeypatch):
    """Reference DySample passes pin_memory=True (arch_util.py:92), which
    needs CUDA; strip it on the CPU-only build."""
    real = torch.tensor

    def no_pin(*args, **kwargs):
        kwargs.pop("pin_memory", None)
        return real(*args, **kwargs)

    monkeypatch.setattr(torch, "tensor", no_pin)


def test_ea2fpn_pth_import_exact(cpu_pinmem):
    """Full reference ea2fpn (default net_d) -> our flax ea2fpn: same
    eval logits.  Burn-in updates BN running stats and SN u/v so the
    transferred state is non-trivial."""
    _fake_torchvision()
    mod = _load_ref_arch("ea2fpn_arch")
    m = mod.ea2fpn()
    x = np.random.default_rng(11).random((2, 64, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    m.train()
    with torch.no_grad():
        for _ in range(3):
            m(xt)
    m.eval()
    with torch.no_grad():
        theirs = m(xt).numpy().transpose(0, 2, 3, 1)
    ours = _ours("ea2fpn", {}, _state_dict_np(m), x)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_ea2fpn_pth_export_roundtrip(cpu_pinmem):
    """Random flax ea2fpn -> torch layout (incl. the aliased layer_down*
    trunk copies, fc head, and the never-called s2 DySample) -> strict
    load into the reference module -> identical eval logits."""
    _fake_torchvision()
    mod = _load_ref_arch("ea2fpn_arch")
    x = np.random.default_rng(12).random((1, 64, 64, 3)).astype(np.float32)
    net = build_network({"type": "ea2fpn"}, scale=4)
    variables = net.init(jax.random.PRNGKey(2), jnp.asarray(x))
    sd = to_torch_state_dict(
        jax.device_get(variables["params"]), "ea2fpn",
        batch_stats=jax.device_get(variables["batch_stats"]),
    )
    m = mod.ea2fpn()
    missing, unexpected = m.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected
    m.eval()
    with torch.no_grad():
        theirs = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = jax.jit(lambda v, y: net.apply(v, y))(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3,
    )
