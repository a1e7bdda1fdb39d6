#!/usr/bin/env python
"""Time the train step at higher upscale factors on the real TPU.

    python scripts/probe_scale.py 8 16

Same fenced N-vs-2N differenced timing as probe_g_step.py. The trunk runs
at LR resolution, so higher scales are FASTER per HR voxel (reference
workload geometry: HR patch stays 64x64x10; LR shrinks with scale).
Prints one JSON line per scale.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build, setup_compile_cache  # noqa: E402


def main():
    import jax.numpy as jnp

    scales = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [8]
    setup_compile_cache()

    for scale in scales:
        gan, state, lr, hr, z = build(32, scale=scale)
        for _ in range(3):
            state, m = gan.train_step(state, lr, hr, z, augment=True)
        _ = float(m["total"])

        def run_block(start_it, n_steps):
            nonlocal state
            state = state.replace(it=jnp.int32(start_it))
            t0 = time.perf_counter()
            for _ in range(n_steps):
                state, m = gan.train_step(state, lr, hr, z, augment=True)
            _ = float(m["total"])
            return time.perf_counter() - t0

        def timed_block(start_it, n_small=6, n_big=18, passes=2):
            run_block(start_it, 2)
            t_small = min(run_block(start_it, n_small) for _ in range(passes))
            t_big = min(run_block(start_it, n_big) for _ in range(passes))
            return (t_big - t_small) / (n_big - n_small)

        t_g, t_d = timed_block(0), timed_block(50)
        vps = 2 * 32 * 64 * 64 * 10 / (t_g + t_d)
        print(json.dumps({
            "scale": scale,
            "g_step_ms": round(t_g * 1e3, 2),
            "d_step_ms": round(t_d * 1e3, 2),
            "blended_vox_per_sec": round(vps, 1),
            "vs_baseline": round(vps / (150000 / (3 * 24 * 3600) * 32 * 64 * 64 * 10), 2),
        }), flush=True)
        del gan, state, lr, hr, z


if __name__ == "__main__":
    main()
