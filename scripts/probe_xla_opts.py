#!/usr/bin/env python
"""A/B XLA compiler-option overrides on the real-TPU train step.

Client-side XLA_FLAGS do not reliably reach the axon remote compiler, but
``lower().compile(compiler_options=...)`` serializes env_option_overrides
into the compile request, so this is the way to probe TPU compiler knobs
(e.g. xla_tpu_scoped_vmem_limit_kib) over the tunnel.

    python scripts/probe_xla_opts.py '{"xla_tpu_scoped_vmem_limit_kib": "65536"}'
    python scripts/probe_xla_opts.py '{}'       # AOT-path baseline
    python scripts/probe_xla_opts.py '{...}' --d  # also time the D block

Prints one JSON line {"g_step_ms": ..., "d_step_ms": ..., "opts": {...}}.
Timing matches scripts/probe_g_step.py (fenced N-vs-2N differencing on a
scalar fetch).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build, setup_compile_cache  # noqa: E402


def main():
    import jax.numpy as jnp

    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    argv = [
        a for a in sys.argv[1:]
        if not a.startswith("--")
        and (sys.argv[sys.argv.index(a) - 1] != "--passes")
    ]
    opts = json.loads(argv[0]) if argv else {}
    # the A/B must control compiler options alone: zero bench.build()'s
    # own scoped-VMEM default so the probe's compile() opts are the only
    # overrides in the executable
    os.environ["WINDSR_SCOPED_VMEM_KIB"] = "0"
    setup_compile_cache()

    gan, state, lr, hr, z = build(32)
    lowered = gan._jit_train_step.lower(state, lr, hr, z, None, augment=True)
    compiled = lowered.compile(compiler_options=opts or None)

    def step(st):
        st, m = compiled(st, lr, hr, z, None)
        return st, m

    for _ in range(3):
        state, m = step(state)
    _ = float(m["total"])

    def run_block(start_it, n_steps):
        nonlocal state
        state = state.replace(it=jnp.int32(start_it))
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, m = step(state)
        _ = float(m["total"])
        return time.perf_counter() - t0

    def timed_block(start_it, n_small=6, n_big=18):
        run_block(start_it, 2)
        t_small = min(run_block(start_it, n_small) for _ in range(passes))
        t_big = min(run_block(start_it, n_big) for _ in range(passes))
        return (t_big - t_small) / (n_big - n_small)

    print(json.dumps({"g_step_ms": round(timed_block(0) * 1e3, 2),
                      "d_step_ms": round(timed_block(50) * 1e3, 2)
                      if "--d" in sys.argv else None,
                      "opts": opts}))


if __name__ == "__main__":
    main()
