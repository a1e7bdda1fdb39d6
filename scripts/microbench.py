#!/usr/bin/env python
"""Component microbenchmarks on the real chip: where does the G step go?"""

import sys
import time

import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench as bench_mod

    batch = 32
    gan, state, lr, hr, z = bench_mod.build(batch, use_remat=False)
    params_G = state.params_G

    # 1. G forward (eval)
    fwd = jax.jit(lambda p, a, b: gan.G.apply({"params": p}, a, b, train=False))
    print(f"G fwd:              {timeit(fwd, params_G, lr, z):8.1f} ms")

    # 2. G fwd+bwd, pixel loss only
    def pix_loss(p):
        fake = gan.G.apply({"params": p}, lr, z, train=False)
        return jnp.mean(jnp.abs(hr - fake))

    g_pix = jax.jit(jax.grad(pix_loss))
    print(f"G fwd+bwd (pix):    {timeit(g_pix, params_G):8.1f} ms")

    # 3. physics losses alone (no G)
    from gan_sr_wind_field_tpu.ops.physics import (
        gradient_norm_factors, wind_field_gradient,
    )

    def phys(a, b):
        hg = wind_field_gradient(a, gan.x, gan.y, z)
        sg = wind_field_gradient(b, gan.x, gan.y, z)
        fs = gradient_norm_factors(hg, sg)
        return sum(jnp.mean(((hg - sg) / f) ** 2) for f in fs)

    sr = hr * 0.9
    print(f"physics fwd:        {timeit(jax.jit(phys), hr, sr):8.1f} ms")
    print(f"physics fwd+bwd:    {timeit(jax.jit(jax.grad(phys, argnums=1)), hr, sr):8.1f} ms")

    # 4. D forward ×2 (eval mode)
    hr3 = hr[..., :3]
    d_fwd = jax.jit(
        lambda p, bs, a, b: (
            gan.D.apply({"params": p, "batch_stats": bs}, a, train=False)
            + gan.D.apply({"params": p, "batch_stats": bs}, b, train=False)
        )
    )
    print(f"D fwd x2 (eval):    {timeit(d_fwd, state.params_D, state.batch_stats_D, hr3, hr3):8.1f} ms")

    # 5. full G-branch grad (what the train step's cond body does)
    keys = gan._split_keys(state.rng)
    it = jnp.int32(1)

    def full_g(p):
        total, _ = gan._g_losses(p, state, lr, hr, z, it, keys, True,
                                 gan.default_weights)
        return total

    print(f"G-branch fwd+bwd:   {timeit(jax.jit(jax.grad(full_g)), params_G):8.1f} ms")


if __name__ == "__main__":
    main()
