"""Shared model machinery (mesh, best-metric tracking, logging).

Counterpart of /root/reference/neosr/models/base.py:21-526 minus everything
torch: device placement / DDP wrap / GradScaler are replaced by the mesh and
jit; optimizer/scheduler factories live in neosr_tpu.optimizers; loss-dict
reduction is unnecessary (device scalars are fetched lazily by the logger).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

from neosr_tpu.parallel.mesh import make_mesh
from neosr_tpu.utils.logger import get_root_logger


class base:
    def __init__(self, opt: dict[str, Any]) -> None:
        self.opt = opt
        self.is_train = opt.get("is_train", False)
        num_devices = opt.get("num_gpu")
        if num_devices in (None, "auto", 0):
            num_devices = None
        self.mesh = make_mesh(
            num_devices=num_devices,
            space_axis=opt.get("spatial_parallel", 1),
        )
        self.log_dict: dict[str, Any] = OrderedDict()
        self.best_metric_results: dict[str, Any] = {}

    # ------------------------------------------------------------------ api
    def feed_data(self, data: dict[str, Any]) -> None:
        raise NotImplementedError

    def optimize_parameters(self, current_iter: int) -> None:
        raise NotImplementedError

    def save(self, epoch: int, current_iter: int) -> None:
        raise NotImplementedError

    def validation(
        self, dataloader, current_iter: int, tb_logger=None, save_img: bool = True
    ) -> None:
        """Dispatch to the (non-)distributed validation loop."""
        self.nondist_validation(dataloader, current_iter, tb_logger, save_img)

    def get_current_log(self) -> dict[str, Any]:
        return self.log_dict

    def update_learning_rate(self, current_iter: int, warmup_iter: int = -1) -> None:
        """No-op: schedules are compiled into the optax optimizers."""

    # --------------------------------------------------------- best metrics
    def _initialize_best_metric_results(self, dataset_name: str) -> None:
        if dataset_name in self.best_metric_results:
            return
        record = {}
        for metric, content in self.opt["val"]["metrics"].items():
            better = content.get("better", "higher")
            init_val = float("-inf") if better == "higher" else float("inf")
            record[metric] = {"better": better, "val": init_val, "iter": -1}
        self.best_metric_results[dataset_name] = record

    def _update_best_metric_result(
        self, dataset_name: str, metric: str, val: float, current_iter: int
    ) -> None:
        record = self.best_metric_results[dataset_name][metric]
        if record["better"] == "higher":
            if val >= record["val"]:
                record["val"] = val
                record["iter"] = current_iter
        elif val <= record["val"]:
            record["val"] = val
            record["iter"] = current_iter

    def _log_validation_metric_values(
        self, current_iter: int, dataset_name: str, tb_logger, metric_results: dict
    ) -> None:
        log_str = f"Validation {dataset_name}\n"
        for metric, value in metric_results.items():
            log_str += f"\t # {metric}: {value:.4f}"
            if dataset_name in self.best_metric_results:
                record = self.best_metric_results[dataset_name][metric]
                log_str += f"\tBest: {record['val']:.4f} @ {record['iter']} iter"
            log_str += "\n"
        logger = get_root_logger()
        logger.info(log_str)
        if tb_logger:
            for metric, value in metric_results.items():
                tb_logger.add_scalar(
                    f"metrics/{dataset_name}/{metric}", value, current_iter
                )
