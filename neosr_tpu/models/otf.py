"""OTF training strategy: image model + fused device-side degradations.

Counterpart of /root/reference/neosr/models/otf.py:23-291 (Real-ESRGAN
degradation synthesis in feed_data + shuffled training-pair pool,
queue_size default 180, otf.py:37-90).  TPU-native design: the ENTIRE
training iteration — degradation graph, pool shuffle/swap, batch
augmentations (traced MixUp/CutMix/ResizeMix/CutBlur selection), G/D
losses, optimizer updates, EMA — is ONE jitted XLA program.  `feed_data`
only transfers the (uint8) GT batch and per-sample kernels to the device;
`optimize_parameters` runs the fused step with the pool buffers donated,
so per-iteration dispatch overhead is two host calls instead of five+.

Validation bypasses synthesis (paired data path, reference otf.py:285-291).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from neosr_tpu.data.augmentations import make_augment_fn
from neosr_tpu.data.otf_device import make_degradation_fn
from neosr_tpu.models.image import image
from neosr_tpu.utils.misc import tc
from neosr_tpu.utils.registry import MODEL_REGISTRY


def _pool_update(pool_lq, pool_gt, ptr, lq, gt, key):
    """Training-pair pool as traced control flow (reference otf.py:37-90).

    While the pool is filling (ptr < q) the new batch is written at ptr and
    passes through unchanged; once full, the pool is shuffled, the first
    `b` pairs pop out, and the new batch takes their place.
    """
    q = pool_lq.shape[0]
    b = lq.shape[0]

    def fill(args):
        pool_lq, pool_gt, ptr = args
        pool_lq = jax.lax.dynamic_update_slice(pool_lq, lq, (ptr, 0, 0, 0))
        pool_gt = jax.lax.dynamic_update_slice(pool_gt, gt, (ptr, 0, 0, 0))
        return pool_lq, pool_gt, ptr + b, lq, gt

    def swap(args):
        pool_lq, pool_gt, ptr = args
        perm = jax.random.permutation(key, q)
        pool_lq = pool_lq[perm]
        pool_gt = pool_gt[perm]
        out_lq = pool_lq[:b]
        out_gt = pool_gt[:b]
        pool_lq = jax.lax.dynamic_update_slice(pool_lq, lq, (0, 0, 0, 0))
        pool_gt = jax.lax.dynamic_update_slice(pool_gt, gt, (0, 0, 0, 0))
        return pool_lq, pool_gt, ptr, out_lq, out_gt

    return jax.lax.cond(ptr < q, fill, swap, (pool_lq, pool_gt, ptr))


@MODEL_REGISTRY.register()
class otf(image):
    def __init__(self, opt: dict[str, Any]) -> None:
        if opt.get("color") == "y":
            msg = (
                f"{tc.red}color='y' is not supported by the otf model: the "
                "Real-ESRGAN degradation pipeline (gray-noise blending, "
                "DiffJPEG chroma path) is defined on RGB. Train grayscale "
                "with model_type='image'.{}"
            ).format(tc.end)
            raise ValueError(msg)
        super().__init__(opt)
        train_ds = opt["datasets"].get("train", {})
        self.patch_size = train_ds.get("patch_size", 48)
        self.queue_size = train_ds.get("queue_size", 180)
        self.aug = train_ds.get("augmentation")
        self.aug_prob = train_ds.get("aug_prob")
        if self.aug is not None and self.patch_size % 4 != 0:
            msg = f"{tc.red}patch_size must be a multiple of 4 when using augmentations.{tc.end}"
            raise ValueError(msg)

        self._fused_step = None
        self._pending = None  # (gt, k1, k2, sk) device arrays awaiting the fused step
        self._pool_lq = None
        self._pool_gt = None
        self._pool_ptr = None

    def _build_fused(self, gt_size: int) -> None:
        degrade = make_degradation_fn(
            self.opt["datasets"]["train"], self.scale, gt_size, self.patch_size
        )
        augment = (
            make_augment_fn(self.scale, self.aug, self.aug_prob)
            if self.aug is not None
            else None
        )
        step_raw = self._train_step_raw
        use_pool = bool(self.queue_size)
        mesh = self.mesh
        multi = mesh is not None and mesh.size > 1
        if multi:
            from neosr_tpu.parallel.mesh import batch_sharding

            bspec = batch_sharding(mesh)

        def fused(state, pool_lq, pool_gt, ptr, gt, k1, k2, sk):
            rng, k_deg, k_pool, k_aug = jax.random.split(state.rng, 4)
            state = state.replace(rng=rng)
            gt_p, lq_p = degrade(gt, k1, k2, sk, k_deg)
            if use_pool:
                pool_lq, pool_gt, ptr, lq_p, gt_p = _pool_update(
                    pool_lq, pool_gt, ptr, lq_p, gt_p, k_pool
                )
            if augment is not None and gt_p.shape[0] > 1:
                gt_p, lq_p = augment(gt_p, lq_p, k_aug)
            if multi:  # keep the training batch data-parallel over the mesh
                lq_p = jax.lax.with_sharding_constraint(lq_p, bspec)
                gt_p = jax.lax.with_sharding_constraint(gt_p, bspec)
            new_state, losses = step_raw(state, lq_p, gt_p)
            return new_state, pool_lq, pool_gt, ptr, losses

        # donate state + pool buffers: they are overwritten every step
        self._fused_step = jax.jit(fused, donate_argnums=(0, 1, 2, 3))

    def _ensure_pool(self) -> None:
        b = self.opt["datasets"]["train"].get("batch_size", 1) * max(
            self.opt.get("num_gpu", 1), 1
        )
        lq_size = self.patch_size
        gt_patch = self.patch_size * self.scale
        q = max((self.queue_size // b) * b, b)
        self._pool_lq = jnp.zeros((q, lq_size, lq_size, 3), jnp.float32)
        self._pool_gt = jnp.zeros((q, gt_patch, gt_patch, 3), jnp.float32)
        self._pool_ptr = jnp.zeros([], jnp.int32)

    def feed_data(self, data: dict[str, Any]) -> None:
        if not self.is_train or "kernel1" not in data:
            super().feed_data(data)
            return

        gt = jnp.asarray(data["gt"])
        k1 = jnp.asarray(data["kernel1"])
        k2 = jnp.asarray(data["kernel2"])
        sk = jnp.asarray(data["sinc_kernel"])

        if self._fused_step is None:
            self._build_fused(int(gt.shape[1]))
            if self.queue_size:
                self._ensure_pool()
        self._pending = (gt, k1, k2, sk)

    def optimize_parameters(self, current_iter: int) -> None:
        if self._pending is None:  # paired data (validation-style feed)
            super().optimize_parameters(current_iter)
            return
        gt, k1, k2, sk = self._pending
        self._pending = None
        (
            self.state, self._pool_lq, self._pool_gt, self._pool_ptr, losses,
        ) = self._fused_step(
            self.state, self._pool_lq, self._pool_gt, self._pool_ptr,
            gt, k1, k2, sk,
        )
        self.log_dict = losses
