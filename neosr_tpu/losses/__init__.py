"""Loss builder + automatic registration.

Counterpart of /root/reference/neosr/losses/__init__.py:14-39.
"""

from __future__ import annotations

import importlib
from copy import deepcopy
from os import path as osp
from typing import Any

from neosr_tpu.utils.logger import get_root_logger
from neosr_tpu.utils.misc import scandir
from neosr_tpu.utils.registry import LOSS_REGISTRY

__all__ = ["build_loss"]

_loss_folder = osp.dirname(osp.abspath(__file__))
_skip = {"__init__", "loss_util"}
_loss_modules = sorted(
    osp.splitext(osp.basename(f))[0]
    for f in scandir(_loss_folder, suffix=".py")
    if osp.splitext(osp.basename(f))[0] not in _skip
)
for _m in _loss_modules:
    importlib.import_module(f"neosr_tpu.losses.{_m}")


def build_loss(opt: dict[str, Any]):
    opt = deepcopy(opt)
    loss_type = opt.pop("type")
    loss = LOSS_REGISTRY.get(loss_type)(**opt)
    logger = get_root_logger()
    logger.info(f"Loss [{loss.__class__.__name__}] is created.")
    return loss
