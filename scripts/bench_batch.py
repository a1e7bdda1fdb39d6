#!/usr/bin/env python
"""Throughput vs batch size + the no-adv (generator-only) workload."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench as bench_mod

    def fence(m):
        return float(m["total"])

    def timed_pair(gan, state, lr, hr, z, start_it):
        def run(n):
            nonlocal state
            state = state.replace(it=jnp.int32(start_it))
            t0 = time.perf_counter()
            m = None
            for _ in range(n):
                state, m = gan.train_step(state, lr, hr, z, augment=True)
            fence(m)
            return time.perf_counter() - t0

        run(2)
        # return the live state: train_step donates its input, so the
        # caller's handle is dead after this
        return (run(12) - run(4)) / 8, state

    for batch, remat in ((32, False), (64, True)):
        gan, state, lr, hr, z = bench_mod.build(batch, use_remat=remat)
        t_g, state = timed_pair(gan, state, lr, hr, z, 0)
        t_d, state = timed_pair(gan, state, lr, hr, z, 50)
        vox = batch * 64 * 64 * 10
        print(f"batch={batch} remat={remat}: g={t_g*1e3:.0f}ms d={t_d*1e3:.0f}ms "
              f"blended={2*vox/(t_g+t_d)/1e6:.2f} Mvox/s "
              f"g-only={vox/t_g/1e6:.2f} Mvox/s")


if __name__ == "__main__":
    main()
