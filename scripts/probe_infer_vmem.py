#!/usr/bin/env python
"""Scoped-VMEM sweep on the SERVING graph (no-grad generate).

The 64 MiB ``xla_tpu_scoped_vmem_limit_kib`` override was swept and fixed
on the G/D TRAIN steps (scripts/probe_xla_opts.py — clean U-curve with a
65536 KiB optimum); the serving forward is a different program (fused
Pallas trunk + split head, no backward), so its optimum need not match.
This sweeps the knob on ``gan._jit_generate`` at the serving batch.

    python scripts/probe_infer_vmem.py [--batch 128] [--vals 0,49152,65536,98304]

0 = compiler default. One JSON line per value (ms/forward + Mvox/s).
Timing: device-resident inputs, scalar-fence + N-vs-2N differencing
(see bench.py — block_until_ready is not a fence over the tunnel).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import build, setup_compile_cache  # noqa: E402


def main():
    batch = 128
    vals = [0, 49152, 65536, 98304]
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--vals" in sys.argv:
        vals = [int(v) for v in
                sys.argv[sys.argv.index("--vals") + 1].split(",")]

    # the sweep must own the knob: zero bench.build()'s default override
    os.environ["WINDSR_SCOPED_VMEM_KIB"] = "0"
    setup_compile_cache()

    import jax
    import jax.numpy as jnp

    gan, state, lr, hr, z = build(batch)
    lr_d = jax.device_put(np.asarray(lr))
    z_d = jax.device_put(np.asarray(z))
    lowered = gan._jit_generate.lower(state.params_G, lr_d, z_d)
    vox = batch * 64 * 64 * 10

    for v in vals:
        opts = {"xla_tpu_scoped_vmem_limit_kib": str(v)} if v else None
        compiled = lowered.compile(compiler_options=opts)

        def run(n):
            acc = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                out = compiled(state.params_G, lr_d, z_d)
                acc = acc + jnp.mean(out)
            _ = float(acc)
            return time.perf_counter() - t0

        run(2)  # warm dispatch path
        t1 = min(run(6) for _ in range(2))
        t2 = min(run(18) for _ in range(2))
        dt = (t2 - t1) / 12
        print(json.dumps({
            "scoped_vmem_kib": v,
            "batch": batch,
            "infer_ms": round(dt * 1e3, 2),
            "mvox_s": round(vox / dt / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
