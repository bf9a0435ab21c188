"""Wavelet-guided GAN bands: 1-level stationary wavelet transform on device.

Capability parity with /root/reference/neosr/losses/wavelet_guided.py:106-432:
the Y channel (BT.601, x255+16) of SR and GT is decomposed with an a-trous
SWT (periodic padding, sum-normalized analysis lowpass), and the scaled
LH/HL/HH bands (x0.025/0.025/0.02) are what the discriminator sees when
`wavelet_guided` is enabled.

The reference uses pywt's sym19 filter bank.  pywt isn't in this image, so:
* if pywt is importable, its sym19 coefficient table is used (exact parity);
* otherwise the least-asymmetric (symlet) 19-moment filter bank is computed
  here by phase-optimal spectral factorization — the construction that
  defines the symN family — so support, vanishing moments AND the
  near-linear phase match; only the residual table-vs-search tie-breaking
  could differ, which at most mirrors bands spatially.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _z_root_groups(n: int) -> list[list[complex]]:
    """Spectral-factorization root groups of the Daubechies product filter.

    Returns one group per selectable factor: a real y-root yields
    ``[z_inside]`` (its reciprocal is the alternative), a conjugate pair of
    complex y-roots yields ``[z, conj(z)]`` (the reciprocal pair is the
    alternative).  Choosing inside-vs-outside per group spans every real
    orthogonal factorization of the same |H|."""
    from math import comb

    p_coeffs = np.array([comb(n - 1 + k, k) for k in range(n)], dtype=np.float64)
    y_roots = np.roots(p_coeffs[::-1])
    groups: list[list[complex]] = []
    used = np.zeros(len(y_roots), dtype=bool)
    for i, y in enumerate(y_roots):
        if used[i]:
            continue
        used[i] = True
        b = 2.0 - 4.0 * y
        disc = np.sqrt(b * b - 4.0 + 0j)
        z1, z2 = (b + disc) / 2.0, (b - disc) / 2.0
        z_in = z1 if abs(z1) < 1.0 else z2
        if abs(y.imag) < 1e-12:
            groups.append([complex(z_in.real, 0.0) if abs(z_in.imag) < 1e-9
                           else z_in])
        else:
            # pair with the conjugate y-root so coefficients stay real
            j = int(np.argmin(np.abs(y_roots - np.conj(y)) + used * 1e9))
            used[j] = True
            groups.append([z_in, np.conj(z_in)])
    return groups


def _filter_from_selection(groups: list[list[complex]], flips: int,
                           n: int) -> np.ndarray:
    h = np.array([1.0 + 0j])
    for gi, grp in enumerate(groups):
        roots = [1.0 / r for r in grp] if (flips >> gi) & 1 else grp
        for r in roots:
            h = np.convolve(h, np.array([1.0, -r]))
    for _ in range(n):
        h = np.convolve(h, np.array([1.0, 1.0]))
    h = np.real(h)
    return h * np.sqrt(2.0) / h.sum()


def _phase_nonlinearity(h: np.ndarray, n_freq: int = 512) -> float:
    """Max deviation of unwrapped phase from its best linear fit on (0, pi)."""
    H = np.fft.fft(h, 8 * n_freq)[1:n_freq]  # skip omega=0
    w = 2.0 * np.pi * np.arange(1, n_freq) / (8.0 * n_freq)
    phase = np.unwrap(np.angle(H))
    tau = np.polyfit(w, phase, 1)
    return float(np.max(np.abs(phase - np.polyval(tau, w))))


@functools.lru_cache(maxsize=8)
def daubechies_filters(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(dec_lo, dec_hi) for dbN (extremal phase: all roots inside)."""
    groups = _z_root_groups(n)
    h = _filter_from_selection(groups, 0, n)
    dec_lo = h[::-1].copy()
    dec_hi = np.array(
        [(-1) ** k * dec_lo[len(dec_lo) - 1 - k] for k in range(len(dec_lo))]
    )
    return dec_lo, dec_hi


@functools.lru_cache(maxsize=8)
def symlet_filters(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(dec_lo, dec_hi) for symN — the least-asymmetric Daubechies family.

    Same |H(omega)| as dbN; among the 2^G spectral factorizations (inside vs
    outside the unit circle per root group) picks the one minimizing the
    phase's deviation from linear — the construction that defines the symN
    family (Daubechies, Ten Lectures, ch. 8).  Exhaustive search: G <= 9 for
    n = 19, so at most 512 candidates, each scored by FFT."""
    groups = _z_root_groups(n)
    best_flips, best_score = 0, np.inf
    for flips in range(1 << len(groups)):
        score = _phase_nonlinearity(_filter_from_selection(groups, flips, n))
        if score < best_score - 1e-12:
            best_flips, best_score = flips, score
    h = _filter_from_selection(groups, best_flips, n)
    dec_lo = h[::-1].copy()
    dec_hi = np.array(
        [(-1) ** k * dec_lo[len(dec_lo) - 1 - k] for k in range(len(dec_lo))]
    )
    return dec_lo, dec_hi


def _filter_bank() -> tuple[np.ndarray, np.ndarray]:
    try:
        import pywt

        w = pywt.Wavelet("sym19")
        dec_lo = np.asarray(w.dec_lo, np.float64)
        dec_hi = np.asarray(w.dec_hi, np.float64)
    except ImportError:
        dec_lo, dec_hi = symlet_filters(19)
    # reference normalization (wavelet_guided.py:389-396)
    an_lo = dec_lo / dec_lo.sum()
    an_hi = dec_hi
    return an_lo.astype(np.float32), an_hi.astype(np.float32)


def _periodic_conv1d(x: jnp.ndarray, filt: np.ndarray, axis: int) -> jnp.ndarray:
    """Periodic-padded correlation along a spatial axis of NHWC x."""
    L = len(filt)
    pad_lo = L // 2
    pad_hi = L - 1 - pad_lo
    pads = [(0, 0)] * 4
    pads[axis] = (pad_lo, pad_hi)
    xp = jnp.pad(x, pads, mode="wrap")
    if axis == 1:
        kern2d = jnp.asarray(filt)[:, None, None, None]
        kern = jnp.tile(kern2d, (1, 1, 1, x.shape[-1]))
        window = (L, 1)
    else:
        kern2d = jnp.asarray(filt)[None, :, None, None]
        kern = jnp.tile(kern2d, (1, 1, 1, x.shape[-1]))
        window = (1, L)
    return jax.lax.conv_general_dilated(
        xp, kern, (1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def swt_bands(y: jnp.ndarray) -> jnp.ndarray:
    """One SWT level. y: (B,H,W,1) -> (B,H,W,4) = [LL, LH, HL, HH]."""
    an_lo, an_hi = _filter_bank()
    # analysis filters are applied flipped (correlation of mirrored filter)
    lo = an_lo[::-1].copy()
    hi = an_hi[::-1].copy()
    lo_r = _periodic_conv1d(y, lo, axis=2)
    hi_r = _periodic_conv1d(y, hi, axis=2)
    ll = _periodic_conv1d(lo_r, lo, axis=1)
    lh = _periodic_conv1d(hi_r, lo, axis=1)
    hl = _periodic_conv1d(lo_r, hi, axis=1)
    hh = _periodic_conv1d(hi_r, hi, axis=1)
    return jnp.concatenate([ll, lh, hl, hh], axis=-1)


def wavelet_guided(output: jnp.ndarray, gt: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scaled high-frequency bands of SR and GT (NHWC in, (B,H,W,3) out)."""
    def bands(img):
        ycoef = jnp.asarray([65.481, 128.553, 24.966], img.dtype)
        y = 16.0 + (img @ ycoef)[..., None]
        w = swt_bands(jax.lax.stop_gradient(y) if img is gt else y)
        lh = w[..., 1:2] * 0.025
        hl = w[..., 2:3] * 0.025
        hh = w[..., 3:4] * 0.02
        return jnp.concatenate([lh, hl, hh], axis=-1)

    return bands(output), bands(gt)
