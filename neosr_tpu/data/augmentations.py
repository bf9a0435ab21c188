"""Batch augmentations: MixUp / CutMix / ResizeMix / CutBlur (device-side).

Behavioral parity with /root/reference/neosr/data/augmentations.py:13-310:
LQ is upsampled to GT resolution (antialiased), augs run in HR space with
per-batch random boxes/ratios, then LQ is downsampled back (antialiased
bicubic).  Which augs to apply per batch is a host-side choice (mirroring
the reference's random.choices); the boxes/ratios/permutations are traced
jax.random draws inside per-aug jitted fns, so each aug compiles once.
Traced box coordinates become iota masks (static shapes).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from neosr_tpu.ops.resize import METHOD_CODES, _k_cubic, _k_linear, aa_matrix as _aa_matrix


def _resize_static(x: jnp.ndarray, out_h: int, out_w: int, method: str) -> jnp.ndarray:
    wh = _aa_matrix(x.shape[1], out_h, method)
    ww = _aa_matrix(x.shape[2], out_w, method)
    y = jnp.einsum("oi,niwc->nowc", wh, x, preferred_element_type=jnp.float32)
    return jnp.einsum("oj,nhjc->nhoc", ww, y, preferred_element_type=jnp.float32)


def _rand_box(key, h: int, w: int, cut_frac):
    """Traced box (y1,y2,x1,x2) centered at a random point, reference
    rand_bbox semantics (sizes floor(dim*frac), clipped)."""
    k1, k2 = jax.random.split(key)
    cut_h = jnp.floor(h * cut_frac).astype(jnp.int32)
    cut_w = jnp.floor(w * cut_frac).astype(jnp.int32)
    cy = jax.random.randint(k1, (), 0, h)
    cx = jax.random.randint(k2, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def _box_mask(h: int, w: int, y1, y2, x1, x2) -> jnp.ndarray:
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (((iy >= y1) & (iy < y2)) & ((ix >= x1) & (ix < x2)))[None, :, :, None]


@jax.jit
def mixup(gt: jnp.ndarray, lq: jnp.ndarray, key) -> tuple[jnp.ndarray, jnp.ndarray]:
    k1, k2 = jax.random.split(key)
    lam = jax.random.uniform(k1, minval=0.4, maxval=0.6)
    perm = jax.random.permutation(k2, gt.shape[0])
    other = gt[perm]  # reference mixes BOTH with the permuted GT
    return lam * gt + (1 - lam) * other, lam * lq + (1 - lam) * other


@jax.jit
def cutmix(gt: jnp.ndarray, lq: jnp.ndarray, key) -> tuple[jnp.ndarray, jnp.ndarray]:
    k1, k2, k3 = jax.random.split(key, 3)
    lam = jax.random.uniform(k1, minval=0.0, maxval=0.9)
    cut_frac = jnp.sqrt(1.0 - lam)
    perm = jax.random.permutation(k2, gt.shape[0])
    y1, y2, x1, x2 = _rand_box(k3, gt.shape[1], gt.shape[2], cut_frac)
    mask = _box_mask(gt.shape[1], gt.shape[2], y1, y2, x1, x2)
    return (
        jnp.where(mask, gt[perm], gt),
        jnp.where(mask, lq[perm], lq),
    )


@jax.jit
def resizemix(gt: jnp.ndarray, lq: jnp.ndarray, key) -> tuple[jnp.ndarray, jnp.ndarray]:
    h, w = gt.shape[1], gt.shape[2]
    k1, k2, k3 = jax.random.split(key, 3)
    tao = jax.random.uniform(k1, minval=0.2, maxval=0.9)
    perm = jax.random.permutation(k2, gt.shape[0])
    y1, y2, x1, x2 = _rand_box(k3, h, w, tao)
    mask = _box_mask(h, w, y1, y2, x1, x2)

    def box_matrix(size, b1, b2):
        """Rows j in [b1,b2) sample an antialiased bicubic resize of the full
        axis into the box; other rows are zero."""
        j = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)
        i = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)
        span = jnp.maximum((b2 - b1).astype(jnp.float32), 1.0)
        scale = size / span
        fs = jnp.maximum(scale, 1.0)
        center = (j - b1 + 0.5) * scale - 0.5
        wgt = _k_cubic((i - center) / fs)
        wgt = wgt / jnp.maximum(jnp.sum(wgt, axis=1, keepdims=True), 1e-8)
        return wgt * ((j >= b1) & (j < b2))

    wh = box_matrix(h, y1, y2)
    ww = box_matrix(w, x1, x2)

    def paste(img, other):
        resized = jnp.einsum("oi,niwc->nowc", wh, other)
        resized = jnp.einsum("oj,nhjc->nhoc", ww, resized)
        resized = jnp.clip(resized, 0, 1)
        return jnp.where(mask, resized, img)

    return paste(gt, gt[perm]), paste(lq, lq[perm])


@jax.jit
def cutblur(gt: jnp.ndarray, lq: jnp.ndarray, key) -> tuple[jnp.ndarray, jnp.ndarray]:
    k1, k2 = jax.random.split(key)
    lam = jax.random.uniform(k1, minval=0.2, maxval=0.7)
    y1, y2, x1, x2 = _rand_box(k2, gt.shape[1], gt.shape[2], lam)
    mask = _box_mask(gt.shape[1], gt.shape[2], y1, y2, x1, x2)
    return gt, jnp.where(mask, gt, lq)


_AUG_FNS = {"mixup": mixup, "cutmix": cutmix, "resizemix": resizemix, "cutblur": cutblur}


@functools.partial(jax.jit, static_argnames=("scale", "mode"))
def _lq_to_hr(lq, scale: int, mode: str):
    return jnp.clip(
        _resize_static(lq, lq.shape[1] * scale, lq.shape[2] * scale, mode), 0, 1
    )


@functools.partial(jax.jit, static_argnames=("scale",))
def _hr_to_lq(lq_hr, scale: int):
    return jnp.clip(
        _resize_static(lq_hr, lq_hr.shape[1] // scale, lq_hr.shape[2] // scale, "bicubic"),
        0, 1,
    )


def apply_augment(
    gt: jnp.ndarray,
    lq: jnp.ndarray,
    scale: int = 1,
    augs=("none", "mixup", "cutmix", "resizemix", "cutblur"),
    prob=(0.1, 0.3, 0.2, 0.7, 0.8),
    multi_prob: float = 0.3,
    key=None,
    np_rng: np.random.Generator | None = None,
):
    """Host-orchestrated per-batch augmentation (reference apply_augment)."""
    if len(augs) != len(prob):
        msg = "Length of 'augmentation' and aug_prob don't match!"
        raise ValueError(msg)
    if gt.shape[0] == 1:
        msg = "Augmentations need batch >1 to work."
        raise ValueError(msg)
    if np_rng is None:
        np_rng = np.random.default_rng()
    if key is None:
        key = jax.random.key(int(np_rng.integers(0, 2**31)))

    if scale > 1:
        mode = "bilinear" if np_rng.random() < 0.5 else "bicubic"
        lq = _lq_to_hr(lq, scale, mode)

    chosen: list[str] = []
    if np_rng.random() < multi_prob and len(augs) > 2:
        num = int(np_rng.integers(2, len(augs)))
        weighted = list(zip(augs, prob))
        for _ in range(num):
            ws = np.asarray([w for _, w in weighted], np.float64)
            idx = int(np_rng.choice(len(weighted), p=ws / ws.sum()))
            chosen.append(weighted.pop(idx)[0])
    else:
        ws = np.asarray(prob, np.float64)
        chosen.append(augs[int(np_rng.choice(len(augs), p=ws / ws.sum()))])

    for name in ("cutmix", "mixup", "resizemix", "cutblur"):
        if name in chosen:
            key, sub = jax.random.split(key)
            gt, lq = _AUG_FNS[name](gt, lq, sub)

    if scale > 1:
        lq = _hr_to_lq(lq, scale)
    return gt, lq


def make_augment_fn(
    scale: int,
    augs=("none", "mixup", "cutmix", "resizemix", "cutblur"),
    prob=(0.1, 0.3, 0.2, 0.7, 0.8),
    multi_prob: float = 0.3,
):
    """Fully-traced apply_augment for fusion into a single XLA program.

    Same per-batch distribution as the host-orchestrated version (reference
    augmentations.py:219-310): with prob `multi_prob` a random number
    num in [2, len(augs)) of DISTINCT augs is drawn by weighted sampling
    without replacement, else one weighted draw.  The Gumbel-top-k trick
    reproduces sequential weighted sampling without replacement exactly, so
    the selection can be traced; augs apply in the same fixed order.
    """
    if len(augs) != len(prob):
        msg = "Length of 'augmentation' and aug_prob don't match!"
        raise ValueError(msg)
    augs = tuple(augs)
    w = np.asarray(prob, np.float64)
    log_w = jnp.asarray(np.log(np.maximum(w, 1e-30)), jnp.float32)
    n = len(augs)
    can_multi = multi_prob > 0 and n > 2

    def augment(gt, lq, key):
        if gt.shape[0] == 1:
            msg = "Augmentations need batch >1 to work."
            raise ValueError(msg)
        k_mode, k_multi, k_num, k_sel, k_app = jax.random.split(key, 5)

        if scale > 1:  # LQ -> HR space (random bilinear/bicubic, ref :262)
            lq = jax.lax.cond(
                jax.random.bernoulli(k_mode),
                lambda x: _lq_to_hr(x, scale, "bilinear"),
                lambda x: _lq_to_hr(x, scale, "bicubic"),
                lq,
            )

        # weighted sampling without replacement via Gumbel top-k
        gumbel = jax.random.gumbel(k_sel, (n,))
        rank = jnp.argsort(jnp.argsort(-(log_w + gumbel)))
        if can_multi:
            num = jnp.where(
                jax.random.bernoulli(k_multi, multi_prob),
                jax.random.randint(k_num, (), 2, n),
                1,
            )
        else:
            num = jnp.ones((), jnp.int32)
        selected = rank < num

        keys = jax.random.split(k_app, 4)
        for i, name in enumerate(("cutmix", "mixup", "resizemix", "cutblur")):
            if name in augs:
                idx = augs.index(name)
                fn = _AUG_FNS[name]
                gt, lq = jax.lax.cond(
                    selected[idx],
                    lambda g, l, k, fn=fn: fn(g, l, k),
                    lambda g, l, k: (g, l),
                    gt, lq, keys[i],
                )

        if scale > 1:
            lq = _hr_to_lq(lq, scale)
        return gt, lq

    return augment
