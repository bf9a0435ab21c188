"""Fused on-device Real-ESRGAN degradation pipeline (single jitted graph).

TPU-native redesign of the reference's otf.feed_data
(/root/reference/neosr/models/otf.py:92-283).  The reference's Python-side
branching (per-batch resize scale/mode, gaussian-vs-poisson, JPEG/sinc order)
would recompile per combination under jit; here every random decision is a
*traced* value drawn from a jax.random key chain:

* random resize -> dense sampling-matrix matmuls on a fixed canvas with a
  traced valid size (ops/resize.py), so continuous scales compile once;
* blur -> one grouped depthwise conv with per-sample kernels (ops/filter.py);
* noise -> per-sample sigma/scale/gray flags; Poisson vals via a 256-bin
  presence histogram (the unique-count trick, jit-safe);
* JPEG -> DCT-matmul DiffJPEG with traced per-sample quality;
* order swap / second blur / gaussian-vs-poisson -> lax.cond.

One compiled graph covers the full randomness space; everything runs on
device at bf16/f32 with zero host sync.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from neosr_tpu.ops.diffjpeg import diff_jpeg
from neosr_tpu.ops.filter import filter2d
from neosr_tpu.ops.resize import canvas_resize_matrix, apply_matrices

# host constant on purpose: a module-level jnp array would live on the
# device (created eagerly at import) and every FRESH trace that closes
# over it must d2h-copy it to bake the IR constant — an avoidable round
# trip over the axon tunnel (and the site of a transient
# FAILED_PRECONDITION during the round-4 bench retrace).
_GRAY_W = np.asarray([0.299, 0.587, 0.114], np.float32)


def _sample_resize_scale(key, probs, srange):
    """up/down/keep choice then uniform scale (traced scalar)."""
    k1, k2 = jax.random.split(key)
    choice = jax.random.choice(k1, 3, p=jnp.asarray(probs, jnp.float32))
    u = jax.random.uniform(k2)
    up = 1.0 + u * (srange[1] - 1.0)
    down = srange[0] + u * (1.0 - srange[0])
    return jnp.where(choice == 0, up, jnp.where(choice == 1, down, 1.0))


def _gaussian_noise(key, shape_bhwc, sigma_range, gray_prob):
    b, h, w, c = shape_bhwc
    k1, k2, k3 = jax.random.split(key, 3)
    sigma = jax.random.uniform(
        k1, (b, 1, 1, 1), minval=sigma_range[0], maxval=sigma_range[1]
    )
    gray = (jax.random.uniform(k2, (b, 1, 1, 1)) < gray_prob).astype(jnp.float32)
    noise = jax.random.normal(k3, (b, h, w, c)) * sigma / 255.0
    # gray noise = first channel broadcast (keep (b,h,w,c) layouts — a
    # trailing dim of 1 wastes 127/128 TPU lanes)
    noise_gray = jnp.broadcast_to(noise[..., :1], noise.shape)
    return noise * (1 - gray) + noise_gray * gray


def _count_vals(img: jnp.ndarray) -> jnp.ndarray:
    """2^ceil(log2(#unique 8-bit levels)) per sample (B,).

    Scatter-free: each pixel sets one bit of a 256-bit presence mask (8
    uint32 words) and the OR-reduction + popcount run on the VPU — the naive
    256-bin scatter histogram serializes on TPU (~140 ms/step measured)."""
    b = img.shape[0]
    q = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.int32)
    flat = q.reshape(b, -1)
    word_idx = flat >> 5  # value's word in [0, 8)
    bit = jnp.left_shift(
        jnp.uint32(1), (flat & 31).astype(jnp.uint32)
    )
    words = []
    for w in range(8):
        masked = jnp.where(word_idx == w, bit, jnp.uint32(0))
        words.append(
            jax.lax.reduce(masked, jnp.uint32(0), jax.lax.bitwise_or, (1,))
        )
    words = jnp.stack(words, axis=1)  # (b, 8)
    uniq = jax.lax.population_count(words).sum(axis=1).astype(jnp.float32)
    return 2.0 ** jnp.ceil(jnp.log2(jnp.maximum(uniq, 1.0)))


def _poisson_fast(key, lam):
    """Fixed-op-count Poisson sampler for the degradation pipeline.

    `jax.random.poisson`'s transformed-rejection sampler lowers to
    data-dependent while-loops, which serialize on TPU (measured 15-20
    ms/step of the fused OTF graph at gt 256 / canvas 384).  This sampler
    is one fused elementwise pass with no loops:

    - lam < 8: EXACT inverse-CDF with 24 unrolled pmf terms
      (P(X > 24 | lam < 8) < 2e-6, the only truncation).
    - lam >= 8: third-moment-matched normal (Cornish-Fisher skew
      correction  x = lam + sqrt(lam) z + (z^2 - 1)/6, rounded, clipped
      at 0) — matches mean/variance/skewness of the Poisson; for the
      pipeline's lam in [8, 512] the KS distance to exact is < 0.01.

    For training-data noise augmentation this is statistically
    indistinguishable; `[degradations] poisson_sampler = "exact"`
    restores `jax.random.poisson` for strict reference semantics.
    """
    kz, ku = jax.random.split(key)
    z = jax.random.normal(kz, lam.shape)
    u = jax.random.uniform(ku, lam.shape)
    big = jnp.maximum(jnp.round(lam + jnp.sqrt(lam) * z + (z * z - 1.0) / 6.0), 0.0)
    lam_s = jnp.minimum(lam, 8.0)
    pmf = jnp.exp(-lam_s)
    cdf = pmf
    x = jnp.zeros_like(lam)
    for k in range(1, 25):
        x = x + (u > cdf).astype(lam.dtype)
        pmf = pmf * (lam_s / k)
        cdf = cdf + pmf
    return jnp.where(lam < 8.0, x, big)


def _poisson_noise(key, img, scale_range, gray_prob, sampler="fast"):
    b = img.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = jax.random.uniform(
        k1, (b, 1, 1, 1), minval=scale_range[0], maxval=scale_range[1]
    )
    gray = (jax.random.uniform(k2, (b, 1, 1, 1)) < gray_prob).astype(jnp.float32)
    draw = (_poisson_fast if sampler == "fast"
            else lambda k, lam: jax.random.poisson(k, lam).astype(jnp.float32))

    imgq = jnp.clip(jnp.round(img * 255.0), 0, 255) / 255.0
    vals = _count_vals(imgq)[:, None, None, None]
    out = draw(k3, imgq * vals).astype(jnp.float32) / vals
    noise = out - imgq

    # gray path stays (b,h,w): a trailing channel dim of 1 maps to a single
    # TPU lane and ran ~200x slower (measured 75 ms vs 0.4 ms)
    img_gray = jnp.clip(jnp.round((img @ _GRAY_W) * 255.0), 0, 255) / 255.0
    vals_g = _count_vals(img_gray[..., None])[:, None, None]
    out_g = draw(k4, img_gray * vals_g).astype(jnp.float32) / vals_g
    noise_gray = (out_g - img_gray)[..., None]
    noise_gray = jnp.broadcast_to(noise_gray, noise.shape)

    return (noise * (1 - gray) + noise_gray * gray) * scale


def _add_noise(key, img, cfg, stage: str):
    """Gaussian-or-Poisson (clip=True rounds=False, reference semantics)."""
    suffix = "" if stage == "1" else "2"
    k1, k2, k3 = jax.random.split(key, 3)
    gauss_p = cfg.get(f"gaussian_noise_prob{suffix}", 0.5)
    gray_p = cfg.get(f"gray_noise_prob{suffix}", 0.0)

    def gaussian(_):
        return _gaussian_noise(
            k2, img.shape, cfg.get(f"noise_range{suffix}", (1, 30)), gray_p
        )

    def poisson(_):
        return _poisson_noise(
            k3, img, cfg.get(f"poisson_scale_range{suffix}", (0.05, 3)), gray_p,
            cfg.get("poisson_sampler", "fast"),
        )

    use_gauss = jax.random.uniform(k1) < gauss_p
    noise = jax.lax.cond(use_gauss, gaussian, poisson, None)
    return jnp.clip(img + noise, 0.0, 1.0)


def _resize_to_valid(img, in_vh, in_vw, out_canvas_h, out_canvas_w, out_vh, out_vw, method):
    wh = canvas_resize_matrix(img.shape[1], out_canvas_h, in_vh, out_vh, method)
    ww = canvas_resize_matrix(img.shape[2], out_canvas_w, in_vw, out_vw, method)
    return apply_matrices(img, wh, ww)


def make_degradation_fn(cfg: dict[str, Any], scale: int, gt_size: int = 512, patch_size: int = 48):
    """Build the jitted degradation fn(gt, k1, k2, sinc_k, key) -> (gt_patch, lq_patch).

    cfg holds the [degradations] table (merged into the train dataset opt by
    the config layer, same keys as the reference templates).
    """
    lq_size = gt_size // scale
    r1 = tuple(cfg.get("resize_range", (0.5, 1.5)))
    r2 = tuple(cfg.get("resize_range2", (0.3, 1.5)))
    canvas1 = int(-(-int(gt_size * max(r1[1], 1.0)) // 16) * 16)
    canvas2 = int(-(-int(lq_size * max(r2[1], 1.0)) // 16) * 16)
    p1 = cfg.get("resize_prob", (0.2, 0.7, 0.1))
    p2 = cfg.get("resize_prob2", (0.3, 0.4, 0.3))
    jpeg1 = tuple(cfg.get("jpeg_range", (75, 95)))
    jpeg2 = tuple(cfg.get("jpeg_range2", (75, 95)))
    second_blur_prob = cfg.get("second_blur_prob", 0.8)

    def degrade(gt, kernel1, kernel2, sinc_kernel, key):
        # uint8 GT batches normalize in-graph (4x cheaper host->device copy)
        if jnp.issubdtype(gt.dtype, jnp.integer):
            gt = gt.astype(jnp.float32) / 255.0
        b = gt.shape[0]
        keys = jax.random.split(key, 14)

        # ---------------- stage 1 ----------------
        out = filter2d(gt, kernel1)

        s1 = _sample_resize_scale(keys[0], p1, r1)
        mode1 = jax.random.randint(keys[1], (), 0, 3)
        v1h = jnp.clip(jnp.floor(gt_size * s1), 1, canvas1)
        v1w = v1h
        out = _resize_to_valid(
            out, jnp.float32(gt_size), jnp.float32(gt_size),
            canvas1, canvas1, v1h, v1w, mode1,
        )

        out = _add_noise(keys[2], out, cfg, "1")

        q1 = jax.random.uniform(keys[3], (b,), minval=jpeg1[0], maxval=jpeg1[1])
        out = diff_jpeg(jnp.clip(out, 0, 1), q1)

        # ---------------- stage 2 ----------------
        out = jax.lax.cond(
            jax.random.uniform(keys[4]) < second_blur_prob,
            lambda x: filter2d(x, kernel2),
            lambda x: x,
            out,
        )

        s2 = _sample_resize_scale(keys[5], p2, r2)
        mode2 = jax.random.randint(keys[6], (), 0, 3)
        v2 = jnp.clip(jnp.floor(lq_size * s2), 1, canvas2)
        out = _resize_to_valid(out, v1h, v1w, canvas2, canvas2, v2, v2, mode2)

        out = _add_noise(keys[7], out, cfg, "2")

        # ---------------- final: [resize+sinc] <-> JPEG order swap ----------
        mode3 = jax.random.randint(keys[8], (), 0, 3)
        q2 = jax.random.uniform(keys[9], (b,), minval=jpeg2[0], maxval=jpeg2[1])

        def resize_sinc_then_jpeg(x):
            x = _resize_to_valid(
                x, v2, v2, lq_size, lq_size,
                jnp.float32(lq_size), jnp.float32(lq_size), mode3,
            )
            x = filter2d(x, sinc_kernel)
            return diff_jpeg(jnp.clip(x, 0, 1), q2)

        def jpeg_then_resize_sinc(x):
            x = diff_jpeg(jnp.clip(x, 0, 1), q2)
            x = _resize_to_valid(
                x, v2, v2, lq_size, lq_size,
                jnp.float32(lq_size), jnp.float32(lq_size), mode3,
            )
            return filter2d(x, sinc_kernel)

        out = jax.lax.cond(
            jax.random.uniform(keys[10]) < 0.5,
            resize_sinc_then_jpeg, jpeg_then_resize_sinc, out,
        )

        # clamp/round to the 8-bit lattice (reference otf.py:251)
        lq = jnp.clip(jnp.round(out * 255.0), 0, 255) / 255.0

        # paired random crop (one offset per batch, reference transforms.py:38)
        top = jax.random.randint(keys[11], (), 0, lq_size - patch_size + 1)
        left = jax.random.randint(keys[12], (), 0, lq_size - patch_size + 1)
        lq_patch = jax.lax.dynamic_slice(
            lq, (0, top, left, 0), (b, patch_size, patch_size, 3)
        )
        gt_patch = jax.lax.dynamic_slice(
            gt, (0, top * scale, left * scale, 0),
            (b, patch_size * scale, patch_size * scale, 3),
        )
        return gt_patch, lq_patch

    return jax.jit(degrade)
