"""TOML config parsing — schema-compatible with the reference.

Accepts the same TOML files and CLI flags as the reference's parse_options
(/root/reference/neosr/utils/options.py:39-275): `-opt file.toml`,
`--auto_resume`, `--debug`, plus the convert-script group.  Differences are
TPU-native by design:

* `--launcher {none,pytorch,slurm}` maps to `jax.distributed.initialize()`
  (auto-detects TPU pods / GKE / Slurm); ranks come from
  ``jax.process_index()`` instead of torch.distributed.
* ``num_gpu`` is accepted for compatibility but normalized into
  ``num_devices`` from the live JAX backend.
* Determinism needs no cudnn/cublas switches — XLA is deterministic by
  default; ``manual_seed`` simply fixes the root `jax.random` key.
"""

from __future__ import annotations

import os
import argparse
import logging
import random
import sys
import tomllib
from pathlib import Path
from typing import Any

from neosr_tpu.utils.misc import set_random_seed, tc


def toml_load(f: str | Path) -> dict[str, Any]:
    """Load a TOML file into a plain dict."""
    try:
        with Path(f).open("rb") as fh:
            return tomllib.load(fh)
    except tomllib.TOMLDecodeError:
        msg = (
            f"{tc.red}Error decoding TOML file {f}. If you are on Windows, "
            f"make sure your paths use single-quotes.{tc.end}"
        )
        raise tomllib.TOMLDecodeError(msg) from None


def build_parser(root_path: str | Path) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="neosr_tpu",
        usage=argparse.SUPPRESS,
        description="-------- neosr_tpu command-line options --------",
    )
    parser._optionals.title = "training and inference"
    parser.add_argument("-opt", type=str, required=False, help="Path to option TOML file.")
    parser.add_argument("--auto_resume", action="store_true", default=False)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument(
        "--local_rank", type=int, default=0, help="accepted for compatibility; unused"
    )
    parser.add_argument(
        "--launcher", choices=["none", "pytorch", "slurm"], default="none",
        help="accepted for compatibility; multi-host init is automatic",
    )

    group = parser.add_argument_group("model conversion")
    group.add_argument("--input", type=str, required=False, help="Input checkpoint path.")
    group.add_argument("-onnx", "--onnx", action="store_true", default=False)
    group.add_argument("-safetensor", "--safetensor", action="store_true", default=False)
    group.add_argument("-pth", "--pth", action="store_true", default=False,
                       help="Export a reference-layout torch .pth (ecosystem interop).")
    group.add_argument("-net", "--network", type=str, required=False)
    group.add_argument("-s", "--scale", type=int, default=4)
    group.add_argument("-window", "--window", type=int, default=None)
    group.add_argument("-opset", "--opset", type=int, default=17)
    group.add_argument("-static", "--static", type=int, nargs=3, default=None)
    group.add_argument("-nocheck", "--nocheck", action="store_true", default=False)
    group.add_argument("-fp16", "--fp16", action="store_true", default=False)
    group.add_argument("-optimize", "--optimize", action="store_true", default=False)
    group.add_argument("-fulloptimization", "--fulloptimization", action="store_true", default=False)
    group.add_argument("--output", type=str, required=False, default=str(root_path))
    return parser


def parse_options(
    root_path: str | Path,
    is_train: bool = True,
    args_list: list[str] | None = None,
) -> tuple[dict[str, Any], argparse.Namespace]:
    """Parse CLI + TOML into the option dict that drives every layer."""
    parser = build_parser(root_path)
    args = parser.parse_args(args_list)

    if args.input is None and args.opt is None:
        msg = (
            f"{tc.red}Didn't get a config! Please link the config file using "
            f"-opt /path/to/config.toml{tc.end}"
        )
        raise ValueError(msg)

    if args.input is not None:
        return {}, args

    if not args.opt.endswith(".toml"):
        msg = f"{tc.light_blue}Config files must be TOML (see options/ templates).{tc.end}"
        raise ValueError(msg)

    maybe_init_distributed(args.launcher)
    opt = toml_load(args.opt)
    opt_from_dict(opt, root_path=root_path, is_train=is_train, debug=args.debug)
    opt["auto_resume"] = args.auto_resume
    return opt, args


def maybe_init_distributed(launcher: str = "none") -> None:
    """Multi-host bootstrap (replaces the reference's NCCL init_dist,
    dist_util.py:12-62).  `jax.distributed.initialize()` auto-detects TPU
    pods, GKE, and Slurm clusters; under `--launcher none` it is only
    attempted when a coordinator is advertised via the environment, so
    single-host runs never pay the probe."""
    import os

    env_hints = (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS", "SLURM_JOB_NUM_NODES",
    )
    if launcher == "none" and not any(os.environ.get(v) for v in env_hints):
        return
    if launcher == "slurm" and int(os.environ.get("SLURM_JOB_NUM_NODES", "1")) <= 1:
        return
    import jax

    try:
        jax.distributed.initialize()
        logging.getLogger("neosr_tpu").info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(), jax.process_count(),
        )
    except Exception as e:  # already initialized, or single-process probe
        logging.getLogger("neosr_tpu").debug("jax.distributed.initialize skipped: %s", e)


def opt_from_dict(
    opt: dict[str, Any],
    root_path: str | Path = ".",
    is_train: bool = True,
    debug: bool = False,
) -> dict[str, Any]:
    """Normalize a raw TOML dict in place (also usable from tests/benches)."""
    import jax  # local import: keep module importable without a live backend

    # --- distributed / device info ----------------------------------------
    try:
        opt["rank"] = jax.process_index()
        opt["world_size"] = jax.process_count()
        n_devices = jax.device_count()
    except Exception:  # no backend (unit tests constructing opts only)
        opt["rank"], opt["world_size"], n_devices = 0, 1, 1
    opt["dist"] = opt["world_size"] > 1

    if opt.get("num_gpu", "auto") == "auto":
        opt["num_gpu"] = n_devices
    opt["num_devices"] = opt.get("num_gpu", n_devices) or n_devices

    # --- seed / determinism -------------------------------------------------
    seed = opt.get("manual_seed")
    if seed is None:
        opt["deterministic"] = False
        seed = random.randint(1024, 10000)
        opt["manual_seed"] = seed
    else:
        opt["deterministic"] = True
    set_random_seed(seed + opt["rank"])

    opt["is_train"] = is_train

    # --- perf knobs ---------------------------------------------------------
    # Global `attn_logits = "bf16"` keeps window-attention QK^T logits in
    # bf16 (fp32 softmax normalizer): +7.9% measured on swinir_medium
    # training (BENCH_NOTES round 3).  Default fp32.  Exposed as an env
    # bridge because the attention helper is shared by every swin-family
    # arch and is read at trace time.
    if opt.get("attn_logits") in ("bf16", "f32", "auto"):
        os.environ["NEOSR_ATTN_LOGITS"] = opt["attn_logits"]

    # Global `d_resize` picks the unet discriminator's 2x-upsample
    # formulation (gather | elementwise | einsum — all parity-tested,
    # tests/test_archs.py); same env bridge, read at trace time.
    if opt.get("d_resize") in ("gather", "elementwise", "einsum"):
        os.environ["NEOSR_D_RESIZE"] = opt["d_resize"]

    if debug and not opt["name"].startswith("debug"):
        opt["name"] = "debug_" + opt["name"]

    # --- datasets -----------------------------------------------------------
    for phase, dataset in opt.get("datasets", {}).items():
        _phase = phase.split("_")[0]
        dataset["phase"] = _phase
        if "scale" in opt:
            dataset["scale"] = opt["scale"]
        if "color" in opt:  # top-level color = "y" reaches the loaders
            dataset.setdefault("color", opt["color"])
        for key in ("dataroot_gt", "dataroot_lq"):
            if dataset.get(key) is not None:
                dataset[key] = str(Path(dataset[key]).expanduser())

    # --- paths --------------------------------------------------------------
    if opt.get("path") is not None:
        for key, val in opt["path"].items():
            if (val is not None) and ("resume_state" in key or "pretrain_network" in key):
                opt["path"][key] = str(Path(val).expanduser())

    if is_train:
        experiments_root = (opt.get("path") or {}).get("experiments_root")
        if experiments_root is None:
            experiments_root = Path(root_path) / "experiments"
        experiments_root = Path(experiments_root) / opt["name"]
        opt.setdefault("path", {})
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = experiments_root / "models"
        opt["path"]["training_states"] = experiments_root / "training_states"
        opt["path"]["log"] = experiments_root
        opt["path"]["visualization"] = experiments_root / "visualization"

        if "debug" in opt["name"]:
            if "val" in opt:
                opt["val"]["val_freq"] = 8
            opt.setdefault("logger", {})
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        opt.setdefault("path", {})
        results_root = opt["path"].get("results_root")
        if results_root is None:
            results_root = Path(root_path) / "experiments" / "results"
        results_root = Path(results_root) / opt["name"]
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root
        opt["path"]["visualization"] = results_root

    return opt


def copy_opt_file(opt_file: str, experiments_root: str | Path) -> None:
    """Copy the TOML into the experiment dir, stamped with the command."""
    import time
    from shutil import copyfile

    cmd = " ".join(sys.argv)
    filename = Path(experiments_root) / Path(opt_file).name
    copyfile(opt_file, filename)
    with Path(filename).open("r+", encoding="utf-8") as f:
        lines = f.readlines()
        lines.insert(0, f"# GENERATE TIME: {time.asctime()}\n# CMD:\n# {cmd}\n\n")
        f.seek(0)
        f.writelines(lines)
