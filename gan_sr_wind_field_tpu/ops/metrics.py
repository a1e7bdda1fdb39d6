"""Evaluation metrics.

PSNR replicates the reference formula exactly (wind_field_GAN_3D.py:730-742):
the "MSE" divides by spatial volume × batch but NOT by channels, and the peak
is max_diff² = 4 (fields normalised to [-1, 1]). We preserve both quirks so
PSNR numbers are directly comparable with the reference's 33-41 dB band.
"""

from __future__ import annotations

import jax.numpy as jnp


def psnr(
    HR: jnp.ndarray,
    SR: jnp.ndarray,
    max_diff_squared: float = 4.0,
    epsilon: float = 1e-8,
) -> jnp.ndarray:
    """PSNR in dB for channel-last volumes (N, X, Y, Z, C).

    Matches reference ``calculate_PSNR``: MSE = Σ(HR-SR)² / (X·Y·Z·N),
    i.e. summed (not averaged) over channels.
    """
    HR = HR.astype(jnp.float32)
    SR = SR.astype(jnp.float32)
    n, w, h, l = HR.shape[0], HR.shape[1], HR.shape[2], HR.shape[3]
    mse = jnp.sum((HR - SR) ** 2) / (w * h * l * n)
    return 10.0 * jnp.log10(max_diff_squared / (mse + epsilon))


def mean_absolute_error(HR: jnp.ndarray, SR: jnp.ndarray) -> jnp.ndarray:
    """Plain L1 ('pix' metric in the reference loss dicts)."""
    return jnp.mean(jnp.abs(HR.astype(jnp.float32) - SR.astype(jnp.float32)))


def wind_vector_error(HR: jnp.ndarray, SR: jnp.ndarray, uvw_max: float):
    """Per-voxel wind-vector error length in m/s (reference test.py:334-374).

    HR/SR are normalised (÷UVW_MAX); returns mean ‖ΔU‖₂ in physical units.
    """
    diff = (HR[..., :3] - SR[..., :3]).astype(jnp.float32) * uvw_max
    return jnp.mean(jnp.sqrt(jnp.sum(diff**2, axis=-1)))


def relative_wind_error(HR: jnp.ndarray, SR: jnp.ndarray):
    """Mean relative vector error ‖ΔU‖/‖U‖ (reference test.py:334-374)."""
    diff = (HR[..., :3] - SR[..., :3]).astype(jnp.float32)
    num = jnp.sqrt(jnp.sum(diff**2, axis=-1))
    den = jnp.sqrt(jnp.sum(HR[..., :3].astype(jnp.float32) ** 2, axis=-1))
    return jnp.mean(num / (den + 1e-12))
