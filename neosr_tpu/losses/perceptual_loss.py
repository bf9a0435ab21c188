"""VGG19 perceptual loss (+ FPK/IPK patch-cosine terms).

Behavioral parity with /root/reference/neosr/losses/vgg_perceptual_loss.py:
57-242: default layer weights {conv1_2:0.1, conv2_2:0.1, conv3_4:1,
conv4_4:1, conv5_4:1}, /10 magnitude balancing, optional PatchLoss (FPK over
feature patches) and IPK (image patches) with scale-dependent kernel sizes.
Weights gating documented in losses/vgg.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from neosr_tpu.losses.basic_loss import chc_loss, huber_loss, l1_loss, mse_loss
from neosr_tpu.losses.vgg import build_feature_extractor
from neosr_tpu.utils.registry import LOSS_REGISTRY


def _patches(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """NHWC -> (B*nP, kernel*kernel*C?) — reference PatchesKernel3D flattens
    per-channel patches (vgg_perceptual_loss.py:19-54 treats C as batch)."""
    b, h, w, c = x.shape
    # per-channel patches: move C into batch
    xc = x.transpose(0, 3, 1, 2).reshape(b * c, h, w, 1)
    p = jax.lax.conv_general_dilated_patches(
        xc.transpose(0, 3, 1, 2), (kernel, kernel), (stride, stride), "VALID"
    )  # (b*c, k*k, nh, nw)
    p = p.reshape(b * c, kernel * kernel, -1)
    return p.transpose(0, 2, 1).reshape(-1, kernel * kernel)


def _patch_cosine(x: jnp.ndarray, gt: jnp.ndarray, kernels, clamp: bool) -> jnp.ndarray:
    loss = jnp.zeros([], jnp.float32)
    for k in kernels:
        if x.shape[1] < k or x.shape[2] < k:
            continue  # feature map smaller than patch kernel (tiny crops)
        xt = _patches(x, k, k // 2)
        gtt = _patches(gt, k, k // 2)
        if clamp:
            xt = jnp.clip(xt, 1e-6, 0.999999)
            gtt = jnp.clip(gtt, 1e-6, 0.999999)
        dy = jnp.std(gtt, axis=1, ddof=1)
        # scale-invariant cosine, row-max normalized for numeric range safety
        xs = xt / (jnp.max(jnp.abs(xt), axis=1, keepdims=True) + 1e-12)
        gs = gtt / (jnp.max(jnp.abs(gtt), axis=1, keepdims=True) + 1e-12)
        dot = jnp.einsum("ik,ik->i", xs, gs)
        cos = dot / (
            jnp.sqrt(jnp.sum(xs**2, axis=1)) * jnp.sqrt(jnp.sum(gs**2, axis=1))
            + 1e-12
        )
        loss = loss + jnp.mean((1.0 - cos) * dy)
    return loss


@LOSS_REGISTRY.register()
class vgg_perceptual_loss:
    def __init__(
        self,
        layer_weights: dict[str, float] | None = None,
        vgg_type: str = "vgg19",
        use_input_norm: bool = True,
        range_norm: bool = False,
        loss_weight: float = 1.0,
        criterion: str = "chc",
        patchloss: bool = False,
        ipk: bool = False,
        patch_weight: float = 1.0,
        scale: int = 4,
        weights_path: str | None = None,
        weights_sha256: str | None = None,
        **kwargs: Any,
    ) -> None:
        self.loss_weight = loss_weight
        self.patchloss = patchloss
        self.ipk = ipk
        self.patch_weight = patch_weight
        self.layer_weights = layer_weights or {
            "conv1_2": 0.1, "conv2_2": 0.1, "conv3_4": 1.0,
            "conv4_4": 1.0, "conv5_4": 1.0,
        }
        if not patchloss and ipk:
            msg = "Please enable PatchLoss to use IPK."
            raise ValueError(msg)
        if patchloss:
            if scale == 4:
                self.perceptual_kernels = (4, 8)
                self.ipk_kernels = (7, 11, 15)
            elif scale == 2:
                self.perceptual_kernels = (3, 6)
                self.ipk_kernels = (3, 5, 7)
            else:
                msg = f"PatchLoss does not support upscale ratio {scale}."
                raise NotImplementedError(msg)

        self.extract, _ = build_feature_extractor(
            list(self.layer_weights.keys()), vgg_type, use_input_norm, range_norm,
            weights_path, weights_sha256,
        )

        crits = {"l1": l1_loss, "l2": mse_loss, "huber": huber_loss}
        if criterion == "chc":
            self._crit = chc_loss(loss_lambda=0, clip_min=0, clip_max=1)
        elif criterion in crits:
            self._crit = crits[criterion]
        else:
            msg = f"{criterion} criterion not supported."
            raise NotImplementedError(msg)

    def __call__(self, x: jnp.ndarray, gt: jnp.ndarray, **kwargs) -> jnp.ndarray:
        x_feats = self.extract(x.astype(jnp.float32))
        gt_feats = self.extract(jax.lax.stop_gradient(gt.astype(jnp.float32)))
        loss = jnp.zeros([], jnp.float32)
        for k, lw in self.layer_weights.items():
            if self.patchloss:
                fpk = jax.lax.stop_gradient(
                    _patch_cosine(x_feats[k], gt_feats[k], self.perceptual_kernels, False)
                )
                loss = loss + fpk * lw * self.patch_weight
                loss = loss + self._crit(x_feats[k], gt_feats[k]) * lw
            else:
                loss = loss + self._crit(x_feats[k] / 10, gt_feats[k] / 10) * lw
        if self.patchloss and self.ipk:
            loss = loss + jax.lax.stop_gradient(
                _patch_cosine(x, gt, self.ipk_kernels, True)
            )
        return loss * self.loss_weight
