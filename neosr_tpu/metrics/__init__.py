"""Metric dispatch (registry-based).

Counterpart of /root/reference/neosr/metrics/__init__.py:10-21.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Any

from neosr_tpu.metrics import calculate  # noqa: F401  (registers metrics)
from neosr_tpu.utils.registry import METRIC_REGISTRY

__all__ = ["calculate_metric"]


def calculate_metric(data: dict[str, Any], opt: dict[str, Any]) -> float:
    opt = deepcopy(opt)
    metric_type = opt.pop("type")
    opt.pop("better", None)
    return METRIC_REGISTRY.get(metric_type)(**data, **opt)
