"""Model (training strategy) builder.

Counterpart of /root/reference/neosr/models/__init__.py:12-37.
"""

from __future__ import annotations

import importlib
from copy import deepcopy
from os import path as osp
from typing import Any

from neosr_tpu.utils.logger import get_root_logger
from neosr_tpu.utils.misc import scandir
from neosr_tpu.utils.registry import MODEL_REGISTRY

__all__ = ["build_model"]

_model_folder = osp.dirname(osp.abspath(__file__))
_skip = {"__init__", "base"}
_model_modules = sorted(
    osp.splitext(osp.basename(f))[0]
    for f in scandir(_model_folder, suffix=".py")
    if osp.splitext(osp.basename(f))[0] not in _skip
)
for _m in _model_modules:
    importlib.import_module(f"neosr_tpu.models.{_m}")


def build_model(opt: dict[str, Any]):
    opt = deepcopy(opt)
    model = MODEL_REGISTRY.get(opt["model_type"])(opt)
    logger = get_root_logger()
    logger.info(f"Model [{model.__class__.__name__}] created.")
    return model
