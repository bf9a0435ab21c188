"""Training entry point.

Same user contract as the reference's train.py
(/root/reference/train.py:150-366): `python train.py -opt config.toml`
[--auto_resume] [--debug], experiment dir layout, it/s + ETA console logs,
periodic checkpointing and validation, KeyboardInterrupt save-and-exit, and
disk-space guard.  The internals are TPU-native: threaded host loader feeding
mesh-sharded device batches into one jitted train step.
"""

from __future__ import annotations

import sys
from os import path as osp
from pathlib import Path

import jax


def load_resume_state(opt):
    resume_state_path = None
    if opt["auto_resume"]:
        state_path = Path(opt["path"]["training_states"])
        if state_path.is_dir():
            states = [
                float(v.stem) for v in state_path.glob("*.state")
            ]
            if states:
                resume_state_path = state_path / f"{int(max(states))}.state"
                opt["path"]["resume_state"] = str(resume_state_path)
    elif opt["path"].get("resume_state"):
        resume_state_path = opt["path"]["resume_state"]
    return resume_state_path


def create_train_val_dataloader(opt, logger):
    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset

    train_loader, val_loaders = None, []
    total_epochs, total_iters = 0, int(opt["logger"].get("total_iter", 1_000_000))
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            if "degradations" in opt:
                dataset_opt.update(opt["degradations"])
                dataset_opt["scale"] = opt["scale"]
                dataset_opt["patch_size"] = dataset_opt.get("patch_size", 48)
            train_set = build_dataset(dataset_opt)
            ratio = dataset_opt.get("dataset_enlarge_ratio", 1)
            sampler = EnlargedSampler(
                len(train_set), opt["world_size"], opt["rank"], ratio,
                opt["manual_seed"],
            )
            train_loader = build_dataloader(
                train_set, dataset_opt, num_devices=jax.local_device_count(),
                sampler=sampler, seed=opt["manual_seed"],
            )
            num_iter_per_epoch = max(len(train_loader), 1)
            total_epochs = -(-total_iters // num_iter_per_epoch)
            logger.info(
                f"Training stats:\n\tImages: {len(train_set)}\n\tBatch(global): "
                f"{train_loader.batch_size}\n\tIters/epoch: {num_iter_per_epoch}"
                f"\n\tTotal epochs: {total_epochs}; iters: {total_iters}."
            )
        elif phase.split("_")[0] == "val":
            val_set = build_dataset(dataset_opt)
            val_loaders.append(build_dataloader(val_set, dataset_opt))
        else:
            msg = f"Dataset phase {phase} is not recognized."
            raise ValueError(msg)
    return train_loader, val_loaders, total_epochs, total_iters


def train_pipeline(root_path: str) -> None:
    from neosr_tpu.models import build_model
    from neosr_tpu.utils import (
        AvgTimer,
        MessageLogger,
        check_disk_space,
        check_resume,
        get_root_logger,
        init_tb_logger,
        make_exp_dirs,
        tc,
    )
    from neosr_tpu.utils.options import copy_opt_file, parse_options

    opt, args = parse_options(root_path, is_train=True)
    opt["root_path"] = root_path

    if opt.get("fast_matmul", False):
        # reference semantics (train.py:169-173: TF32 matmuls); the TPU
        # analog is bf16-input MXU matmuls for fp32 arrays
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    resume_state_path = load_resume_state(opt)
    if resume_state_path is not None:
        # rough resume iter for pretrain rewiring
        resume_iter = int(Path(resume_state_path).stem)
        check_resume(opt, resume_iter)
    else:
        make_exp_dirs(opt)

    log_file = Path(opt["path"]["log"]) / f"train_{opt['name']}.log"
    logger = get_root_logger(log_file=str(log_file))
    logger.info(f"neosr_tpu devices: {jax.devices()}")
    copy_opt_file(args.opt, opt["path"]["experiments_root"])

    tb_logger = None
    if (
        opt.get("logger", {}).get("wandb") is not None
        and opt["logger"]["wandb"].get("project") is not None
        and "debug" not in opt["name"]
    ):
        from neosr_tpu.utils.logger import init_wandb_logger

        init_wandb_logger(opt)  # must precede TensorBoard init (sync mode)
    if opt.get("logger", {}).get("use_tb_logger") and "debug" not in opt["name"]:
        try:
            tb_logger = init_tb_logger(
                osp.join(root_path, "experiments", "tb_logger", opt["name"])
            )
        except Exception as e:
            logger.warning(f"TensorBoard unavailable: {e}")

    result = create_train_val_dataloader(opt, logger)
    train_loader, val_loaders, total_epochs, total_iters = result

    model = build_model(opt)
    start_epoch, current_iter = 0, 0
    if resume_state_path is not None:
        model.resume_training({"path": str(resume_state_path)})
        start_epoch = model.resume_epoch
        current_iter = model.resume_iter
        logger.info(f"Resuming training from epoch: {start_epoch}, iter: {current_iter}.")

    msg_logger = MessageLogger(opt, current_iter, tb_logger)
    logger.info(f"{tc.light_blue}Starting training from epoch: {start_epoch}, iter: {current_iter}{tc.end}")

    train_timer, data_timer = AvgTimer(), AvgTimer()
    print_freq = opt["logger"].get("print_freq", 100)
    # jax.profiler trace capture (SURVEY.md §5 tracing): profile_start/stop
    # iters write a TensorBoard-viewable trace under the experiment dir
    profile_start = opt["logger"].get("profile_start", 0)
    profile_stop = opt["logger"].get("profile_stop", 0)
    save_freq = opt["logger"].get("save_checkpoint_freq", 1000)
    val_freq = opt.get("val", {}).get("val_freq") if opt.get("val") else None

    epoch = start_epoch
    train_iter = iter(train_loader)
    try:
        while current_iter < total_iters:
            train_data = next(train_iter)
            data_timer.record()

            current_iter += 1
            if current_iter % max(len(train_loader), 1) == 0:
                epoch += 1

            if profile_stop and current_iter == profile_start:
                jax.profiler.start_trace(
                    str(Path(opt["path"]["experiments_root"]) / "profile")
                )
            model.feed_data(train_data)
            model.optimize_parameters(current_iter)
            if profile_stop and current_iter == profile_stop:
                jax.block_until_ready(model.state.params_g)
                jax.profiler.stop_trace()
                logger.info(f"{tc.light_blue}Profiler trace written to experiments dir.{tc.end}")
            train_timer.record()
            if current_iter == 1:
                msg_logger.reset_start_time()

            if current_iter % print_freq == 0:
                log_vars = {"epoch": epoch, "iter": current_iter}
                log_vars["lrs"] = model.get_current_learning_rate()
                log_vars["time"] = train_timer.get_avg_time()
                log_vars["data_time"] = data_timer.get_avg_time()
                log_vars.update(model.get_current_log())
                msg_logger(log_vars)

            if current_iter % save_freq == 0:
                if check_disk_space(opt["path"]["experiments_root"]):
                    logger.info(f"{tc.light_blue}Saving models and training states.{tc.end}")
                    model.save(epoch, current_iter)
                else:
                    logger.error("Insufficient disk space; emergency save and exit.")
                    model.save(epoch, current_iter)
                    sys.exit(1)

            if val_freq and current_iter % val_freq == 0:
                for val_loader in val_loaders:
                    model.validation(
                        val_loader, current_iter, tb_logger,
                        opt["val"].get("save_img", True),
                    )
    except KeyboardInterrupt:
        logger.info(f"{tc.red}Interrupted — saving latest models and exiting.{tc.end}")
        model.save(epoch, current_iter)
        train_loader.close()
        sys.exit(0)

    logger.info(f"{tc.light_blue}End of training. Saving final models.{tc.end}")
    model.save(epoch, current_iter)
    if val_freq:
        for val_loader in val_loaders:
            model.validation(val_loader, current_iter, tb_logger, opt["val"].get("save_img", True))
    train_loader.close()


if __name__ == "__main__":
    root_path = osp.abspath(osp.join(__file__, osp.pardir))
    train_pipeline(root_path)
