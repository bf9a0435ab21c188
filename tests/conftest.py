"""Test harness: 8 fake CPU devices (JAX's standard multi-device testing
mechanism), replacing the reference's untestable live-NCCL distribution
story (SURVEY.md §4)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite is compile-bound on 1 CPU core;
# repeat runs reuse every jitted program (first run pays full price)
jax.config.update("jax_compilation_cache_dir", "/tmp/neosr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_paired_dataset(tmp_path_factory):
    """8 GT/LQ pairs on disk: GT 64x64, LQ 16x16 (scale 4)."""
    import cv2

    root = tmp_path_factory.mktemp("data")
    gt_dir = root / "gt"
    lq_dir = root / "lq"
    gt_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.default_rng(42)
    for i in range(8):
        gt = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        lq = cv2.resize(gt, (16, 16), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(gt_dir / f"img{i}.png"), gt)
        cv2.imwrite(str(lq_dir / f"img{i}.png"), lq)
    return {"gt": str(gt_dir), "lq": str(lq_dir)}
