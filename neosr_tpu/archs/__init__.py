"""Network builder + automatic arch registration.

`build_network(opt)` mirrors the reference's dispatch
(/root/reference/neosr/archs/__init__.py:14-34): the `type` string in
`[network_g]` / `[network_d]` selects a registered flax module or factory.
Unlike the reference, the upscale factor and compute dtype are passed
explicitly (no import-time config parsing).
"""

from __future__ import annotations

import importlib
from copy import deepcopy
from os import path as osp
from typing import Any

import jax.numpy as jnp

from neosr_tpu.utils.misc import scandir
from neosr_tpu.utils.registry import ARCH_REGISTRY

__all__ = ["build_network"]

# auto-import every module in this package so registries populate
_arch_folder = osp.dirname(osp.abspath(__file__))
_skip = {"__init__", "arch_util", "swin_util"}
_arch_modules = sorted(
    osp.splitext(osp.basename(f))[0]
    for f in scandir(_arch_folder, suffix=".py")
    if osp.splitext(osp.basename(f))[0] not in _skip
)
for _m in _arch_modules:
    importlib.import_module(f"neosr_tpu.archs.{_m}")


def build_network(opt: dict[str, Any], scale: int | None = None, dtype: Any = None):
    """Instantiate a network module from an opt dict.

    Args:
        opt: the `[network_g]`/`[network_d]` table; `type` selects the arch,
             remaining keys are passed as module attributes.
        scale: the global upscale factor; injected as `upscale`/`scale` if
               the module declares such a field and the config didn't set it.
        dtype: compute dtype (bf16 under mixed precision).
    """
    opt = deepcopy(opt)
    network_type = opt.pop("type")
    cls_or_fn = ARCH_REGISTRY.get(network_type)

    fields = getattr(cls_or_fn, "__dataclass_fields__", {})
    if scale is not None:
        for field in ("upscale", "scale", "upscaling_factor", "upscale_factor"):
            if field in fields and field not in opt:
                opt[field] = scale
    if dtype is not None and "dtype" in fields and "dtype" not in opt:
        opt["dtype"] = dtype
    # factory functions (presets) accept the same treatment via kwargs
    if not fields:
        if scale is not None:
            opt.setdefault("upscale", scale)
        if dtype is not None:
            opt.setdefault("dtype", dtype)
    net = cls_or_fn(**opt)
    return net
