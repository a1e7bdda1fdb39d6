#!/usr/bin/env python
"""Targeted G-step (and optional D-step) timing probe on the real TPU.

Reuses bench.py's workload builder and fenced N-vs-2N differenced timing,
but times only the requested block — for quick A/B of kernel/scheduling
experiments without the full ~9-minute bench. Knobs are passed via env vars
read at import time by the modules under test (e.g. WINDSR_DW_UNROLL).

    python scripts/probe_g_step.py [--d] [--passes 2]

Prints one JSON line {"g_step_ms": ..., "d_step_ms": ...|null, "env": {...}}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build, setup_compile_cache  # noqa: E402


def main():
    import jax  # noqa: F401
    import jax.numpy as jnp

    setup_compile_cache()
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])

    gan, state, lr, hr, z = build(32)
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

    def timed_block(start_it, n_small=6, n_big=18):
        run_block(start_it, 2)
        t_small = min(run_block(start_it, n_small) for _ in range(passes))
        t_big = min(run_block(start_it, n_big) for _ in range(passes))
        return (t_big - t_small) / (n_big - n_small)

    out = {
        "g_step_ms": round(timed_block(0) * 1e3, 2),
        "d_step_ms": round(timed_block(50) * 1e3, 2) if "--d" in sys.argv
        else None,
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("WINDSR_")},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
