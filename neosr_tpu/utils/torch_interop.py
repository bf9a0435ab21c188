"""Import reference-ecosystem torch checkpoints into our flax param trees.

The reference (and the wider SR model ecosystem around it — openmodeldb,
chaiNNer) distributes trained generators as torch ``state_dict``s saved
either raw or wrapped as ``{"params": sd}`` / ``{"params_ema": sd}``
(reference base.py:281-354).  This module converts those key layouts into
neosr_tpu's flax parameter trees so users switching frameworks keep their
existing models:

* ``compact``  — SRVGGNetCompact (reference compact_arch.py:12-85)
* ``esrgan``   — RRDBNet (reference esrgan_arch.py:145-214)
* ``span``     — SPAN (reference span_arch.py:225-294); the train-time
  Conv3XC branches (sk + 1x1/3x3/1x1) are imported, fused ``eval_conv``
  tensors are ignored (they are derived state, span_arch.py:143-179)

Conventions converted: conv kernels OIHW -> HWIO, PReLU ``weight`` ->
``alpha``.  Entry points:

* :func:`convert_state_dict` — flat torch ``{key: ndarray}`` -> nested tree
* :func:`load_torch_checkpoint` — ``.pth``/``.pt`` file -> nested tree
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Callable

import numpy as np

from neosr_tpu.utils.checkpoint import unflatten_params

PARAM_KEYS = ("params-ema", "params_ema", "params")


def _k(w: np.ndarray) -> np.ndarray:
    """Conv kernel OIHW (torch) -> HWIO (flax)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _put_conv(out: dict, scope: str, sd: dict, torch_prefix: str, used: set) -> None:
    out[f"{scope}.Conv_0.kernel"] = _k(sd[f"{torch_prefix}.weight"])
    used.add(f"{torch_prefix}.weight")
    bias = sd.get(f"{torch_prefix}.bias")
    if bias is not None:
        out[f"{scope}.Conv_0.bias"] = bias
        used.add(f"{torch_prefix}.bias")


def convert_compact(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """SRVGGNetCompact: body.{2i} convs / body.{2i+1} activations in call
    order map onto Conv2d_i / PReLU_i (insertion order is definition order,
    which equals forward order — reference compact_arch.py:47-85)."""
    out: dict[str, np.ndarray] = {}
    conv_i = prelu_i = 0
    for key, val in sd.items():
        if key.endswith(".weight") and val.ndim == 4:
            out[f"Conv2d_{conv_i}.Conv_0.kernel"] = _k(val)
            bias = sd.get(key[: -len(".weight")] + ".bias")
            if bias is not None:
                out[f"Conv2d_{conv_i}.Conv_0.bias"] = bias
            conv_i += 1
        elif val.ndim == 1 and key.endswith(".weight"):
            out[f"PReLU_{prelu_i}.alpha"] = val
            prelu_i += 1
    return out


_ESRGAN_TOP = {
    "conv_first": "Conv2d_0",
    "conv_body": "Conv2d_1",
    "conv_up1": "Conv2d_2",
    "conv_up2": "Conv2d_3",
    # conv_last is constructed before conv_hr in our compact-module
    # expression `Conv2d(out_ch)(lrelu(Conv2d(feat)(x)))`, so it takes the
    # earlier auto-name (flax names follow construction order)
    "conv_hr": "Conv2d_5",
    "conv_last": "Conv2d_4",
}


def convert_esrgan(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """RRDBNet: body.{i}.rdb{j}.conv{k} -> RRDB_i.ResidualDenseBlock_{j-1}
    .Conv2d_{k-1}; named head/tail convs per _ESRGAN_TOP."""
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    for key in sd:
        if key in used or not key.endswith(".weight"):
            continue
        prefix = key[: -len(".weight")]
        m = re.fullmatch(r"body\.(\d+)\.rdb(\d)\.conv(\d)", prefix)
        if m:
            i, j, k = (int(g) for g in m.groups())
            scope = f"RRDB_{i}.ResidualDenseBlock_{j - 1}.Conv2d_{k - 1}"
        elif prefix in _ESRGAN_TOP:
            scope = _ESRGAN_TOP[prefix]
        else:
            continue
        _put_conv(out, scope, sd, prefix, used)
    return out


def _conv3xc(out: dict, scope: str, sd: dict, torch_prefix: str, used: set) -> None:
    """Conv3XC train-time branches: sk (1x1 skip) + conv.0/1/2 (1x1-3x3-1x1).
    The fused eval_conv is derived state and skipped (span_arch.py:143-179)."""
    for t_sub, o_sub in (
        ("sk", "Conv2d_0"),
        ("conv.0", "Conv2d_1"),
        ("conv.1", "Conv2d_2"),
        ("conv.2", "Conv2d_3"),
    ):
        _put_conv(out, f"{scope}.{o_sub}", sd, f"{torch_prefix}.{t_sub}", used)


def convert_span(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    used: set[str] = set()
    _conv3xc(out, "Conv3XC_0", sd, "conv_1", used)
    for i in range(1, 7):
        for j in range(1, 4):
            _conv3xc(out, f"SPAB_{i - 1}.Conv3XC_{j - 1}", sd, f"block_{i}.c{j}_r", used)
    _conv3xc(out, "Conv3XC_1", sd, "conv_2", used)
    _put_conv(out, "Conv2d_0", sd, "conv_cat", used)
    _put_conv(out, "Conv2d_1", sd, "upsampler.0", used)
    return out


CONVERTERS: dict[str, Callable[[dict], dict]] = {
    "compact": convert_compact,
    "esrgan": convert_esrgan,
    "span": convert_span,
}


def family(arch_type: str) -> str | None:
    """Map a registered preset name to its converter family."""
    for fam in CONVERTERS:
        if arch_type == fam:
            return fam
    return None


def convert_state_dict(sd: dict[str, Any], arch_type: str) -> dict[str, Any]:
    """Flat torch state_dict -> nested flax param tree for `arch_type`."""
    fam = family(arch_type)
    if fam is None:
        supported = ", ".join(sorted(CONVERTERS))
        msg = (
            f"No torch-checkpoint converter for arch '{arch_type}' "
            f"(supported: {supported}). Re-export via convert.py instead."
        )
        raise ValueError(msg)
    sd_np = {k: np.asarray(v) for k, v in sd.items()}
    flat = CONVERTERS[fam](sd_np)
    return unflatten_params(flat)


def load_torch_checkpoint(
    path: str | Path, arch_type: str, param_key: str = "params"
) -> dict[str, Any]:
    """Load a reference-format .pth and convert to our param tree.

    Accepts both wrapped ({param_key: sd}) and raw state_dicts; searches
    param keys in the reference's order (base.py:385-394)."""
    import torch

    loaded = torch.load(str(path), map_location="cpu", weights_only=True)
    for key in (param_key, *PARAM_KEYS):
        if isinstance(loaded, dict) and key in loaded:
            loaded = loaded[key]
            break
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in loaded.items()}
    return convert_state_dict(sd, arch_type)
