"""Blur-kernel synthesis for the OTF pipeline (host-side numpy).

Capability parity with /root/reference/neosr/data/degradations.py:24-512:
iso/aniso (generalized) Gaussian and plateau kernels, random mixed-kernel
sampling, and the 2D sinc (circular lowpass) kernel via Bessel J1.  Written
from the Real-ESRGAN paper's formulas with an explicit np.random.Generator
(no import-time global RNG).  Kernels are cheap (21x21) and stay on the
host; the expensive convolution happens on device (ops/filter.py).
"""

from __future__ import annotations

import numpy as np
from scipy import special


def sigma_matrix2(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    """Covariance matrix from axis sigmas + rotation."""
    d = np.array([[sig_x**2, 0], [0, sig_y**2]])
    u = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def mesh_grid(kernel_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.hstack(
        (
            xx.reshape(kernel_size * kernel_size, 1),
            yy.reshape(kernel_size * kernel_size, 1),
        )
    ).reshape(kernel_size, kernel_size, 2)
    return xy, xx, yy


def pdf2(sigma_matrix: np.ndarray, grid: np.ndarray) -> np.ndarray:
    inverse_sigma = np.linalg.inv(sigma_matrix)
    return np.exp(-0.5 * np.sum((grid @ inverse_sigma) * grid, 2))


def bivariate_Gaussian(
    kernel_size: int, sig_x: float, sig_y: float, theta: float,
    grid: np.ndarray | None = None, isotropic: bool = True,
) -> np.ndarray:
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    kernel = pdf2(sigma_matrix, grid)
    return kernel / np.sum(kernel)


def bivariate_generalized_Gaussian(
    kernel_size: int, sig_x: float, sig_y: float, theta: float, beta: float,
    grid: np.ndarray | None = None, isotropic: bool = True,
) -> np.ndarray:
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.exp(-0.5 * np.sum((grid @ inverse_sigma) * grid, 2) ** beta)
    return kernel / np.sum(kernel)


def bivariate_plateau(
    kernel_size: int, sig_x: float, sig_y: float, theta: float, beta: float,
    grid: np.ndarray | None = None, isotropic: bool = True,
) -> np.ndarray:
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.reciprocal(np.sum((grid @ inverse_sigma) * grid, 2) ** beta + 1)
    return kernel / np.sum(kernel)


def _sample_sigmas_theta(
    rng: np.random.Generator,
    sigma_x_range: tuple[float, float],
    sigma_y_range: tuple[float, float],
    rotation_range: tuple[float, float],
    isotropic: bool,
) -> tuple[float, float, float]:
    sigma_x = rng.uniform(sigma_x_range[0], sigma_x_range[1])
    if isotropic:
        return sigma_x, sigma_x, 0.0
    sigma_y = rng.uniform(sigma_y_range[0], sigma_y_range[1])
    rotation = rng.uniform(rotation_range[0], rotation_range[1])
    return sigma_x, sigma_y, rotation


def random_mixed_kernels(
    kernel_list: list[str],
    kernel_prob: list[float],
    kernel_size: int = 21,
    sigma_x_range: tuple[float, float] = (0.6, 5),
    sigma_y_range: tuple[float, float] = (0.6, 5),
    rotation_range: tuple[float, float] = (-np.pi, np.pi),
    betag_range: tuple[float, float] = (0.5, 8),
    betap_range: tuple[float, float] = (0.5, 8),
    noise_range=None,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Sample one kernel from the weighted family mix (reference
    degradations.py:379-471 behavior; noise_range multiplicative kernel noise
    is accepted but unused like in the reference's OTF path)."""
    if rng is None:
        rng = np.random.default_rng()
    kernel_type = rng.choice(kernel_list, p=np.asarray(kernel_prob) / np.sum(kernel_prob))
    iso = not str(kernel_type).endswith("aniso")
    sx, sy, theta = _sample_sigmas_theta(
        rng, sigma_x_range, sigma_y_range, rotation_range, iso
    )
    if kernel_type in ("iso", "aniso"):
        kernel = bivariate_Gaussian(kernel_size, sx, sy, theta, isotropic=iso)
    elif kernel_type in ("generalized_iso", "generalized_aniso"):
        beta = rng.uniform(betag_range[0], betag_range[1])
        kernel = bivariate_generalized_Gaussian(
            kernel_size, sx, sy, theta, beta, isotropic=iso
        )
    elif kernel_type in ("plateau_iso", "plateau_aniso"):
        beta = rng.uniform(betap_range[0], betap_range[1])
        kernel = bivariate_plateau(kernel_size, sx, sy, theta, beta, isotropic=iso)
    else:
        msg = f"Unknown kernel type {kernel_type}"
        raise ValueError(msg)
    return kernel.astype(np.float32)


def circular_lowpass_kernel(
    cutoff: float, kernel_size: int, pad_to: int = 0
) -> np.ndarray:
    """2D sinc filter (reference degradations.py:477-512)."""
    assert kernel_size % 2 == 1, "Kernel size must be an odd number."
    with np.errstate(divide="ignore", invalid="ignore"):
        kernel = np.fromfunction(
            lambda x, y: cutoff
            * special.j1(
                cutoff
                * np.sqrt((x - (kernel_size - 1) / 2) ** 2 + (y - (kernel_size - 1) / 2) ** 2)
            )
            / (
                2
                * np.pi
                * np.sqrt((x - (kernel_size - 1) / 2) ** 2 + (y - (kernel_size - 1) / 2) ** 2)
            ),
            [kernel_size, kernel_size],
        )
    kernel[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = cutoff**2 / (4 * np.pi)
    kernel = kernel / np.sum(kernel)
    if pad_to > kernel_size:
        pad_size = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((pad_size, pad_size), (pad_size, pad_size)))
    return kernel.astype(np.float32)


def pulse_tensor(size: int = 21) -> np.ndarray:
    """Identity (delta) kernel used when the final sinc is skipped."""
    k = np.zeros((size, size), np.float32)
    k[size // 2, size // 2] = 1.0
    return k
