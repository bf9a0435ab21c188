"""Inference / evaluation entry point.

Same contract as /root/reference/test.py:15-68: iterate `[datasets.test_*]`,
run the model, save outputs, report metrics + fps.
"""

from __future__ import annotations

import time
from os import path as osp


def test_pipeline(root_path: str) -> None:
    from neosr_tpu.data import build_dataloader, build_dataset
    from neosr_tpu.models import build_model
    from neosr_tpu.utils import get_root_logger, make_exp_dirs
    from neosr_tpu.utils.options import parse_options

    opt, _args = parse_options(root_path, is_train=False)
    make_exp_dirs(opt)
    log_file = osp.join(opt["path"]["log"], f"test_{opt['name']}.log")
    logger = get_root_logger(log_file=log_file)

    test_loaders = []
    for _phase, dataset_opt in sorted(opt["datasets"].items()):
        test_set = build_dataset(dataset_opt)
        test_loaders.append(build_dataloader(test_set, dataset_opt))

    model = build_model(opt)

    for test_loader in test_loaders:
        test_set_name = test_loader.dataset.opt.get("name", "test")
        logger.info(f"Testing {test_set_name}...")
        start = time.time()
        model.validation(
            test_loader,
            current_iter=opt["name"],
            tb_logger=None,
            save_img=opt.get("val", {}).get("save_img", True),
        )
        elapsed = time.time() - start
        n_img = len(test_loader)
        logger.info(f"Inference took {elapsed:.2f} s ({n_img / max(elapsed, 1e-9):.2f} fps)")


if __name__ == "__main__":
    root_path = osp.abspath(osp.join(__file__, osp.pardir))
    test_pipeline(root_path)
