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
    if "neosr" not in sys.modules:
        for mod_name in ("neosr", "neosr.utils", "neosr.archs"):
            pkg = types.ModuleType(mod_name)
            pkg.__path__ = []
            sys.modules[mod_name] = pkg
        registry_mod = types.ModuleType("neosr.utils.registry")

        class _FakeRegistry:
            def register(self, obj=None, suffix=None):
                if obj is None:
                    return lambda f: f
                return obj

        registry_mod.ARCH_REGISTRY = _FakeRegistry()
        sys.modules["neosr.utils.registry"] = registry_mod
        arch_util = types.ModuleType("neosr.archs.arch_util")
        arch_util.net_opt = lambda: (4, True)
        sys.modules["neosr.archs.arch_util"] = arch_util

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
    params = convert_state_dict(sd, our_type.split("_")[0])
    net = build_network({"type": our_type, **our_kwargs}, scale=4)
    ours = jax.jit(lambda p, x: net.apply({"params": p}, x))(
        params, jnp.asarray(x_nhwc)
    )
    with torch.no_grad():
        theirs = torch_model(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=atol, rtol=1e-4)


@pytest.fixture()
def x():
    return np.random.default_rng(0).random((1, 16, 16, 3)).astype(np.float32)


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


def test_unsupported_arch_raises():
    with pytest.raises(ValueError, match="No torch-checkpoint converter"):
        convert_state_dict({}, "swinir_small")
