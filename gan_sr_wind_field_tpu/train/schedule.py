"""Iteration-dependent schedules, all pure functions of the traced `it`.

These run *inside* the jitted train step — no Python-side mutable scheduler
objects (the reference threads torch MultiStepLR + ad-hoc ramps through the
loop; here everything is a function of `it`, so resume is trivially exact).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float,
                 d_g_train_period: int):
    """lr(it) replicating torch MultiStepLR stepped per-iteration.

    The reference calls scheduler.step() after each iteration once
    it > 2·d_g_train_period (train.py:152), so the decay counter at iteration
    ``it`` is max(0, it − 1 − 2·period) and
    lr = base · gamma^{#milestones ≤ counter}.
    """
    ms = jnp.asarray(sorted(milestones), dtype=jnp.int32)
    offset = 2 * d_g_train_period + 1

    def fn(it):
        counter = jnp.maximum(it - offset, 0)
        k = jnp.sum(ms <= counter)
        return base_lr * gamma ** k.astype(jnp.float32)

    return fn


def label_values(it, niter, use_one_sided_label_smoothing: bool,
                 flip_labels: bool):
    """(real_label, fake_label, pred_real, pred_fake) at iteration ``it``.

    One-sided smoothing ramps the real label 0.9 → 1.0 (or the fake label
    0.1 → 0.0 when flipped) over training (reference
    wind_field_GAN_3D.py:627-678).
    """
    itf = it.astype(jnp.float32) if hasattr(it, "astype") else jnp.float32(it)
    real = jnp.float32(1.0)
    fake = jnp.float32(0.0)
    if use_one_sided_label_smoothing and flip_labels:
        fake = 0.1 - 0.1 * itf / niter
    elif use_one_sided_label_smoothing:
        real = 0.9 + 0.1 * itf / niter
    pred_real, pred_fake = (False, True) if flip_labels else (True, False)
    return real, fake, pred_real, pred_fake
