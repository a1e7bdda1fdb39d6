"""Fixed-seed golden-trajectory regression guard.

Eight train steps of the tiny GAN on fixed-seed data must reproduce a
recorded loss trajectory. Any unintended numerics change anywhere in the
step (kernels, losses, optimizer, schedules) shows up here immediately —
the automated CPU analogue of the fixed-seed full-GAN reruns we do on TPU
after every kernel change (reference behaviour under test:
wind_field_GAN_3D.py:207-593 optimize_parameters).

Tolerance is loose (rtol 5e-3) so XLA build drift passes while semantic
changes — which compound far beyond 0.5% within eight steps — fail.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_train_step import make_batch, tiny_cfg

from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

pytestmark = pytest.mark.slow  # multi-minute integration tier (VERDICT r2 weak 5)

# Recorded from the shipped implementation (seed 0 everywhere). The G/D
# alternation (period=2, ratio=1) makes its 1,4,5,8 G steps and 2,3,6,7 D
# steps; each entry is G "total" + "D_train_loss" (exactly one is nonzero
# per step), so the sequence pins both objectives.
GOLDEN_TOTALS = [
    0.0402487218,
    0.6747702956,
    0.7044386864,
    0.0402022526,
    0.0401901379,
    0.7011075616,
    0.7041138411,
    0.0401854403,
]


def _trajectory(cfg):
    x = np.arange(16, dtype=np.float32) * 150
    y = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, y)
    state = gan.init_state(
        jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
    )
    lr, hr, z = make_batch(np.random.default_rng(0))
    got = []
    for _ in range(8):
        state, m = gan.train_step(state, lr, hr, z)
        got.append(float(m["total"]) + float(m["D_train_loss"]))
    assert np.all(np.isfinite(got))
    return got


def test_fixed_seed_loss_trajectory():
    got = _trajectory(tiny_cfg())
    assert got == pytest.approx(GOLDEN_TOTALS, rel=5e-3), got


def test_fixed_seed_loss_trajectory_fused_trunk():
    """The production TPU path (fused Pallas trunk custom VJP, interpret
    mode here) must track the SAME golden trajectory — the automated
    analogue of the fixed-seed TPU reruns. Slightly looser tolerance:
    the kernel accumulates in a different association order (per-step
    grads match flax autodiff at 2e-4, test_fused_train.py)."""
    cfg = tiny_cfg()
    cfg.use_fused_trunk = True
    got = _trajectory(cfg)
    assert got == pytest.approx(GOLDEN_TOTALS, rel=1e-2), got
