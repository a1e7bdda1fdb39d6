#!/usr/bin/env python
"""Perf experiment harness: time train-step variants on the real chip.

Usage: python scripts/bench_sweep.py [variant ...]
Variants: base, noremat, rbg, noaug, noremat_rbg
"""

import sys
import time

import numpy as np


def run_variant(name):
    import jax
    import jax.numpy as jnp

    if "rbg" in name:
        jax.config.update("jax_default_prng_impl", "rbg")

    sys.path.insert(0, ".")
    import importlib

    import bench as bench_mod

    importlib.reload(bench_mod)

    import gan_sr_wind_field_tpu.train.gan as gan_mod

    importlib.reload(gan_mod)

    from gan_sr_wind_field_tpu.config import Config
    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    batch_size = 32
    gan, state, lr, hr, z = bench_mod.build(
        batch_size, use_remat="noremat" not in name
    )
    augment = "noaug" not in name

    for _ in range(3):
        state, m = gan.train_step(state, lr, hr, z, augment=augment)
    float(m["total"])  # scalar fence (block_until_ready is unreliable remote)

    def run_block(start_it, n):
        nonlocal state
        state = state.replace(it=jnp.int32(start_it))
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = gan.train_step(state, lr, hr, z, augment=augment)
        float(m["total"])
        return time.perf_counter() - t0

    def timed(start_it, n_small=5, n_big=15):
        run_block(start_it, 2)
        return (run_block(start_it, n_big) - run_block(start_it, n_small)) / (
            n_big - n_small
        )

    t_g = timed(0)
    t_d = timed(50)
    voxels = batch_size * 64 * 64 * 10
    vps = 2 * voxels / (t_g + t_d)
    print(f"{name}: g={t_g*1e3:.1f}ms d={t_d*1e3:.1f}ms "
          f"blended={vps/1e6:.2f} Mvox/s")


if __name__ == "__main__":
    variants = sys.argv[1:] or ["base"]
    for v in variants:
        run_variant(v)
