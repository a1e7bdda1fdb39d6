"""GAN training tricks, as pure functions of an explicit PRNG key.

Counterpart of reference tools/trainingtricks.py:18-59. The reference quirks
are preserved deliberately:
- instance noise draws from U[0,1) despite the comment claiming N(0,1)
  (trainingtricks.py:56) — scaled by sqrt of a linearly-annealed variance,
- noisy labels are gaussian-perturbed then clamped to [0,1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def noisy_labels(
    key,
    is_real: bool,
    batch_size: int,
    noise_stddev: float = 0.05,
    true_label_val=1.0,
    false_label_val=0.0,
    lower=0.0,
    upper=1.0,
):
    """Label vector (batch,) = base ± gaussian noise, clamped.

    (reference trainingtricks.py:18-46)
    """
    base = jnp.where(is_real, true_label_val, false_label_val)
    noise = jax.random.normal(key, (batch_size,)) * noise_stddev
    return jnp.clip(base + noise, lower, upper)


def instance_noise(key, sigma_base, shape, it, niter):
    """Annealed uniform instance noise for D inputs.

    noise = U[0,1) · sqrt(σ_base · (1 − (it−1)/niter)), linearly annealed to
    zero over training (reference trainingtricks.py:49-59).
    """
    u = jax.random.uniform(key, shape)
    var = sigma_base * (1.0 - (it - 1.0) / niter)
    return u * jnp.sqrt(jnp.maximum(var, 0.0))
