"""Console / file / TensorBoard logging.

Keeps the reference's console contract (it/s + ETA lines, per-loss scalars,
rank-0-only handlers — /root/reference/neosr/utils/logger.py:11-207) while
being process-index aware via JAX instead of torch.distributed.
"""

from __future__ import annotations

import datetime
import logging
import time
from typing import Any

from neosr_tpu.utils.misc import tc

initialized_logger: dict[str, bool] = {}


class AvgTimer:
    """Sliding-window average timer for iteration timing."""

    def __init__(self, window: int = 200) -> None:
        self.window = window
        self.current_time = 0.0
        self.total_time = 0.0
        self.count = 0
        self.avg_time = 0.0
        self.start()

    def start(self) -> None:
        self.start_time = self.tic = time.time()

    def record(self) -> None:
        self.count += 1
        self.toc = time.time()
        self.current_time = self.toc - self.tic
        self.total_time += self.current_time
        self.avg_time = self.total_time / self.count
        if self.count > self.window:
            self.count = 0
            self.total_time = 0
        self.tic = time.time()

    def get_current_time(self) -> float:
        return self.current_time

    def get_avg_time(self) -> float:
        return self.avg_time


class MessageLogger:
    """Format training-iteration log lines and route scalars to TensorBoard."""

    def __init__(self, opt: dict[str, Any], start_iter: int = 1, tb_logger=None) -> None:
        self.exp_name = opt["name"]
        logger_opt = opt.get("logger", {})
        self.interval = logger_opt.get("print_freq", 100)
        self.start_iter = start_iter
        self.max_iters = logger_opt.get("total_iter", 1_000_000)
        self.use_tb_logger = logger_opt.get("use_tb_logger", False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def reset_start_time(self) -> None:
        self.start_time = time.time()

    def __call__(self, log_vars: dict[str, Any]) -> None:
        epoch = log_vars.pop("epoch")
        current_iter = log_vars.pop("iter")
        lrs = log_vars.pop("lrs")
        message = (
            f"{tc.console_log}[ epoch:{epoch:4d} | iter:{current_iter:8,d} | lr:("
            + ", ".join([f"{v:.2e}" for v in lrs])
            + ") ] "
        )
        if "time" in log_vars:
            iter_time = 1.0 / max(log_vars.pop("time"), 1e-12)
            log_vars.pop("data_time", None)
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(current_iter - self.start_iter + 1, 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(max(eta_sec, 0))))
            message += f"[ performance: {iter_time:.3f} it/s ] [ eta: {eta_str} ]"
        for k, v in log_vars.items():
            message += f" | {k}: {v:.4e}"
            if self.tb_logger is not None and "debug" not in self.exp_name:
                label = f"losses/{k}" if k.startswith("l_") else k
                self.tb_logger.add_scalar(label, v, current_iter)
        message += tc.end
        self.logger.info(message)


def init_tb_logger(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        from tensorboardX import SummaryWriter  # type: ignore
    return SummaryWriter(log_dir=str(log_dir))


def init_wandb_logger(opt) -> None:
    """W&B in tensorboard-sync mode (reference logger.py:129-155); gated —
    the wandb package is optional."""
    try:
        import wandb
    except ImportError:
        get_root_logger().warning("wandb is not installed; skipping wandb logger")
        return
    logger_opt = opt.get("logger", {}).get("wandb", {}) or {}
    wandb.init(
        id=wandb.util.generate_id() if logger_opt.get("resume_id") is None else logger_opt["resume_id"],
        resume="allow" if logger_opt.get("resume_id") else None,
        name=opt["name"],
        config=opt,
        project=logger_opt.get("project", "neosr_tpu"),
        sync_tensorboard=True,
    )
    get_root_logger().info("wandb logger initialized (tensorboard sync mode)")


def get_root_logger(
    logger_name: str = "neosr_tpu",
    log_level: int = logging.INFO,
    log_file: str | None = None,
) -> logging.Logger:
    """Root logger with rank-aware handlers (file handler only on process 0)."""
    logger = logging.getLogger(logger_name)
    if logger_name in initialized_logger:
        return logger

    format_str = f"{tc.console_log}%(asctime)s{tc.end} %(message)s"
    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(logging.Formatter(format_str, datefmt="%d-%m-%Y %I:%M %p"))
    logger.addHandler(stream_handler)
    logger.propagate = False

    try:
        import jax
        rank = jax.process_index()
    except Exception:
        rank = 0

    if rank != 0:
        logger.setLevel("ERROR")
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            # append: a resumed run must not clobber the original run's
            # record (the reference keeps history by writing a new
            # timestamped file per run, train.py:40; one appended file
            # keeps the whole trajectory greppable in a single place)
            file_handler = logging.FileHandler(log_file, "a")
            file_handler.setFormatter(
                logging.Formatter("%(asctime)s %(levelname)s: %(message)s")
            )
            file_handler.setLevel(log_level)
            logger.addHandler(file_handler)
    initialized_logger[logger_name] = True
    return logger
