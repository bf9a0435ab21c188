"""Focal frequency loss.

Behavioral parity with /root/reference/neosr/losses/ff_loss.py:8-144:
orthonormal 2D FFT per (optionally cropped) patch, dynamic spectrum weight
matrix normalized per (sample, patch, channel), stop-gradient on the weight,
fp32 math.  NHWC in, internally NCHW-patched to keep the same axis
conventions as the paper.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from neosr_tpu.utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register()
@dataclass
class ff_loss:
    loss_weight: float = 1.0
    alpha: float = 1.0
    patch_factor: int = 1
    ave_spectrum: bool = True
    log_matrix: bool = False
    batch_matrix: bool = False

    def _tensor2freq(self, x: jnp.ndarray) -> jnp.ndarray:
        # NHWC -> NCHW
        x = x.astype(jnp.float32).transpose(0, 3, 1, 2)
        pf = self.patch_factor
        n, c, h, w = x.shape
        assert h % pf == 0 and w % pf == 0, "Patch factor must divide H and W"
        ph, pw = h // pf, w // pf
        patches = [
            x[:, :, i * ph : (i + 1) * ph, j * pw : (j + 1) * pw]
            for i in range(pf)
            for j in range(pf)
        ]
        y = jnp.stack(patches, axis=1)  # (N, P, C, ph, pw)
        freq = jnp.fft.fft2(y, norm="ortho")
        return jnp.stack([freq.real, freq.imag], axis=-1)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray, matrix=None, **kw) -> jnp.ndarray:
        pred_freq = self._tensor2freq(pred)
        target_freq = self._tensor2freq(target)
        if self.ave_spectrum:
            pred_freq = pred_freq.mean(axis=0, keepdims=True)
            target_freq = target_freq.mean(axis=0, keepdims=True)

        if matrix is not None:
            weight = jax.lax.stop_gradient(matrix)
        else:
            d2 = (pred_freq - target_freq) ** 2
            w = jnp.sqrt(d2[..., 0] + d2[..., 1]) ** self.alpha
            if self.log_matrix:
                w = jnp.log(w + 1.0)
            if self.batch_matrix:
                w = w / jnp.maximum(w.max(), 1e-12)
            else:
                w = w / jnp.maximum(
                    w.max(axis=(-2, -1), keepdims=True), 1e-12
                )
            w = jnp.nan_to_num(w, nan=0.0)
            w = jnp.clip(w, 0.0, 1.0)
            weight = jax.lax.stop_gradient(w)

        d2 = (pred_freq - target_freq) ** 2
        freq_distance = d2[..., 0] + d2[..., 1]
        return jnp.mean(weight * freq_distance) * self.loss_weight
