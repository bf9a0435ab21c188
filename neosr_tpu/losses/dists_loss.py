"""DISTS — Deep Image Structure and Texture Similarity (loss + metric).

Capability parity with /root/reference/neosr/losses/dists_loss.py:12-169:
VGG16 stages separated by Hann-window L2 pooling, learned per-channel
alpha/beta weights (bundled; convert with tools/import_dists_weights.py),
structure+texture similarity in each stage.

Deviation (documented): the reference resets its accumulators inside the
stage loop (dists_loss.py:146-160), so only the last stage contributes;
this implementation accumulates over all stages per the DISTS paper.
VGG16 conv weights are gated like the perceptual loss (losses/vgg.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.utils.logger import get_root_logger
from neosr_tpu.utils.registry import LOSS_REGISTRY, METRIC_REGISTRY

_CHNS = (3, 64, 128, 256, 512, 512)
_DEFAULT_ALPHA_BETA = Path(__file__).parent / "dists_alpha_beta.npz"


def _l2_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Hann-window L2 pooling, 3x3 window stride 2 pad 1 (L2pooling, k=5)."""
    a = np.hanning(5)[1:-1]
    g = np.outer(a, a)
    g = (g / g.sum()).astype(np.float32)
    c = x.shape[-1]
    kern = jnp.tile(jnp.asarray(g)[:, :, None, None], (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x * x, kern, (2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return jnp.sqrt(out + 1e-12)


class _DISTSTrunk(nn.Module):
    """VGG16 trunk with L2 pooling between stages; returns 6 feature maps."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        feats = [x]
        cfg = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        h = x
        for stage, (ch, n_convs) in enumerate(cfg, start=1):
            if stage > 1:
                h = _l2_pool(h)
            for i in range(1, n_convs + 1):
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"conv{stage}_{i}")(h)
                h = jax.nn.relu(h)
            feats.append(h)
        return feats


@LOSS_REGISTRY.register()
class dists_loss:
    def __init__(
        self,
        as_loss: bool = True,
        loss_weight: float = 1.0,
        load_weights: bool = True,
        weights_path: str | None = None,
        vgg_weights_path: str | None = None,
        accumulate_stages: bool = False,
        **kwargs: Any,
    ) -> None:
        logger = get_root_logger()
        self.as_loss = as_loss
        self.loss_weight = loss_weight
        # published DISTS sums similarity over ALL VGG stages; the
        # reference resets the accumulator per stage (dists_loss.py:148-162)
        # so only the last stage survives.  Default replicates the
        # reference (checkpoints/metric values transfer 1:1); set
        # accumulate_stages=true for the paper-correct formulation
        # (same opt-out pattern as gw_loss.fixed_kernels).
        self.accumulate_stages = accumulate_stages

        self._trunk = _DISTSTrunk()
        params = self._trunk.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))["params"]
        if not vgg_weights_path:
            from neosr_tpu.losses.vgg import find_torchvision_vgg

            cached = find_torchvision_vgg("vgg16")
            if cached:
                logger.info(f"Using torchvision cache weights: {cached}")
                vgg_weights_path = cached
        if vgg_weights_path:
            from neosr_tpu.losses.vgg import (
                _torchvision_pth_to_npz_dict,
                verify_sha256,
            )

            verify_sha256(vgg_weights_path, kwargs.get("vgg_weights_sha256"))
            if str(vgg_weights_path).endswith((".pth", ".pt")):
                loaded = _torchvision_pth_to_npz_dict("vgg16", vgg_weights_path)
            else:
                loaded = dict(np.load(vgg_weights_path))
            params = {
                layer: {
                    "kernel": jnp.asarray(loaded[f"{layer}.kernel"]).reshape(p["kernel"].shape),
                    "bias": jnp.asarray(loaded[f"{layer}.bias"]).reshape(p["bias"].shape),
                }
                for layer, p in params.items()
            }
        else:
            logger.warning(
                "DISTS: no pretrained VGG16 weights available; using random "
                "trunk (supply vgg_weights_path for real use)."
            )
        self._params = jax.lax.stop_gradient(params)

        rng = np.random.default_rng(0)
        alpha = rng.normal(0.1, 0.01, (sum(_CHNS),)).astype(np.float32)
        beta = rng.normal(0.1, 0.01, (sum(_CHNS),)).astype(np.float32)
        ab_path = weights_path or (
            str(_DEFAULT_ALPHA_BETA) if load_weights and _DEFAULT_ALPHA_BETA.exists() else None
        )
        if ab_path:
            ab = np.load(ab_path)
            alpha = ab["alpha"].reshape(-1).astype(np.float32)
            beta = ab["beta"].reshape(-1).astype(np.float32)
            logger.info(f"DISTS alpha/beta loaded from {ab_path}")
        self._alpha = jnp.asarray(alpha)
        self._beta = jnp.asarray(beta)

    def _features(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        return self._trunk.apply({"params": self._params}, x)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, **kwargs) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        y = y.astype(jnp.float32)
        feats0 = self._features(x)
        feats1 = [jax.lax.stop_gradient(f) for f in self._features(y)]
        c1 = c2 = 1e-6
        w_sum = self._alpha.sum() + self._beta.sum()
        splits = np.cumsum(_CHNS)[:-1]
        alphas = jnp.split(self._alpha / w_sum, splits)
        betas = jnp.split(self._beta / w_sum, splits)

        # NOTE: the reference RESETS dist1/dist2 inside the stage loop
        # (dists_loss.py:148-162: `dist1 = 0` per k), so only the LAST
        # stage's similarity survives.  Published DISTS accumulates all
        # stages; we replicate the reference verbatim so checkpoints and
        # metric values transfer 1:1 (grafted-parity tested).
        dist1 = jnp.zeros((x.shape[0],), jnp.float32)
        dist2 = jnp.zeros((x.shape[0],), jnp.float32)
        for k in range(len(_CHNS)):
            f0, f1 = feats0[k], feats1[k]
            x_mean = f0.mean(axis=(1, 2))
            y_mean = f1.mean(axis=(1, 2))
            s1 = (2 * x_mean * y_mean + c1) / (x_mean**2 + y_mean**2 + c1)
            d1 = (alphas[k][None] * s1).sum(axis=1)

            x_var = ((f0 - x_mean[:, None, None, :]) ** 2).mean(axis=(1, 2))
            y_var = ((f1 - y_mean[:, None, None, :]) ** 2).mean(axis=(1, 2))
            xy_cov = (f0 * f1).mean(axis=(1, 2)) - x_mean * y_mean
            s2 = (2 * xy_cov + c2) / (x_var + y_var + c2)
            d2 = (betas[k][None] * s2).sum(axis=1)
            if self.accumulate_stages:
                dist1, dist2 = dist1 + d1, dist2 + d2
            else:  # reference per-stage reset: last stage wins
                dist1, dist2 = d1, d2

        score = 1.0 - (dist1 + dist2)
        if self.as_loss:
            return score.mean() * self.loss_weight
        return score.squeeze()


_metric_instance: dists_loss | None = None


@METRIC_REGISTRY.register()
def calculate_dists(img, img2, **kwargs) -> float:
    """DISTS metric on HWC uint8/float [0,255] images (reference
    metrics/calculate.py:163-197 contract)."""
    global _metric_instance
    if _metric_instance is None:
        _metric_instance = dists_loss(as_loss=False, **kwargs)
    x = jnp.asarray(np.asarray(img), jnp.float32)[None] / 255.0
    y = jnp.asarray(np.asarray(img2), jnp.float32)[None] / 255.0
    return float(_metric_instance(x, y))
