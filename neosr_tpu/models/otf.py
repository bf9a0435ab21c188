"""OTF training strategy: image model + fused device-side degradations.

Counterpart of /root/reference/neosr/models/otf.py:23-291.  `feed_data`
runs the single-graph degradation pipeline (data/otf_device.py) on the GT
batch + host-synthesized kernels, maintains the shuffled training-pair pool
(queue_size, otf.py:37-90) as device arrays, and applies the batch
augmentations.  Validation bypasses synthesis (paired data path).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from neosr_tpu.data.augmentations import apply_augment
from neosr_tpu.data.otf_device import make_degradation_fn
from neosr_tpu.models.image import image
from neosr_tpu.parallel.mesh import shard_batch
from neosr_tpu.utils.misc import tc
from neosr_tpu.utils.registry import MODEL_REGISTRY


@jax.jit
def _pool_write(pool_lq, pool_gt, lq, gt, ptr):
    pool_lq = jax.lax.dynamic_update_slice(pool_lq, lq, (ptr, 0, 0, 0))
    pool_gt = jax.lax.dynamic_update_slice(pool_gt, gt, (ptr, 0, 0, 0))
    return pool_lq, pool_gt


@jax.jit
def _pool_swap(pool_lq, pool_gt, lq, gt, key):
    """Shuffle the pool, pop batch-size pairs, push the new batch in."""
    q = pool_lq.shape[0]
    b = lq.shape[0]
    perm = jax.random.permutation(key, q)
    pool_lq = pool_lq[perm]
    pool_gt = pool_gt[perm]
    out_lq = pool_lq[:b]
    out_gt = pool_gt[:b]
    pool_lq = jax.lax.dynamic_update_slice(pool_lq, lq, (0, 0, 0, 0))
    pool_gt = jax.lax.dynamic_update_slice(pool_gt, gt, (0, 0, 0, 0))
    return pool_lq, pool_gt, out_lq, out_gt


@MODEL_REGISTRY.register()
class otf(image):
    def __init__(self, opt: dict[str, Any]) -> None:
        super().__init__(opt)
        train_ds = opt["datasets"].get("train", {})
        self.patch_size = train_ds.get("patch_size", 48)
        self.queue_size = train_ds.get("queue_size", 180)
        self.aug = train_ds.get("augmentation")
        self.aug_prob = train_ds.get("aug_prob")
        if self.aug is not None and self.patch_size % 4 != 0:
            msg = f"{tc.red}patch_size must be a multiple of 4 when using augmentations.{tc.end}"
            raise ValueError(msg)

        self._degrade = None
        self._pool_lq = None
        self._pool_gt = None
        self._pool_ptr = 0
        self._np_rng = np.random.default_rng(opt.get("manual_seed", 0))
        self._key = jax.random.key(self._np_rng.integers(0, 2**31))

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def feed_data(self, data: dict[str, Any]) -> None:
        if not self.is_train or "kernel1" not in data:
            super().feed_data(data)
            return

        gt = jnp.asarray(data["gt"])
        k1 = jnp.asarray(data["kernel1"])
        k2 = jnp.asarray(data["kernel2"])
        sk = jnp.asarray(data["sinc_kernel"])

        if self._degrade is None:
            gt_size = int(gt.shape[1])
            self._degrade = make_degradation_fn(
                self.opt["datasets"]["train"], self.scale, gt_size, self.patch_size
            )

        gt_patch, lq_patch = self._degrade(gt, k1, k2, sk, self._next_key())

        # ---- training-pair pool (reference otf.py:37-90) ----
        b = int(gt_patch.shape[0])
        if self.queue_size and self.queue_size >= b:
            q = (self.queue_size // b) * b
            if self._pool_lq is None:
                self._pool_lq = jnp.zeros((q, *lq_patch.shape[1:]), jnp.float32)
                self._pool_gt = jnp.zeros((q, *gt_patch.shape[1:]), jnp.float32)
                self._pool_ptr = 0
            if self._pool_ptr < q:
                self._pool_lq, self._pool_gt = _pool_write(
                    self._pool_lq, self._pool_gt, lq_patch, gt_patch,
                    self._pool_ptr,
                )
                self._pool_ptr += b
            else:
                self._pool_lq, self._pool_gt, lq_patch, gt_patch = _pool_swap(
                    self._pool_lq, self._pool_gt, lq_patch, gt_patch,
                    self._next_key(),
                )

        # ---- batch augmentations ----
        if self.aug is not None and b > 1:
            gt_patch, lq_patch = apply_augment(
                gt_patch, lq_patch, self.scale, self.aug, self.aug_prob,
                key=self._next_key(), np_rng=self._np_rng,
            )

        batch = shard_batch({"lq": lq_patch, "gt": gt_patch}, self.mesh)
        self.lq = batch["lq"]
        self.gt = batch["gt"]
