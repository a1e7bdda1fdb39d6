#!/usr/bin/env python
"""Locate the int8-trunk serving throughput knee above batch 128.

    python scripts/probe_int8_knee.py BATCH [--exact]

One batch size per process (probe_quant_trunk holds all three variants'
buffers and OOMs at batch >= 160); times ONLY the int8-trunk generator
(plus the bf16 exact path with --exact) and prints one JSON line.
Methodology as probe_quant_trunk (scalar fence + N-vs-2N differencing).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import build, setup_compile_cache  # noqa: E402


def main():
    bs = int(sys.argv[1])
    setup_compile_cache()
    import jax.numpy as jnp

    from gan_sr_wind_field_tpu.eval.serve import WindFieldSR

    gan, state, lr, hr, z = build(bs)
    sr = WindFieldSR(gan, state.params_G)
    qt = sr.quantize_trunk(np.asarray(lr))

    def run(gen, n):
        acc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = acc + jnp.mean(gen(lr, z))
        _ = float(acc)
        return time.perf_counter() - t0

    def timed(gen):
        run(gen, 2)
        t1 = min(run(gen, 6) for _ in range(2))
        t2 = min(run(gen, 18) for _ in range(2))
        return (t2 - t1) / 12

    out = {"batch": bs}
    vox = bs * 64 * 64 * 10
    dt = timed(lambda lr, z: gan.generate_quantized(
        state.params_G, None, lr, z, qt))
    out["int8_trunk_ms"] = round(dt * 1e3, 2)
    out["int8_trunk_mvox_s"] = round(vox / dt / 1e6, 2)
    if "--exact" in sys.argv:
        de = timed(lambda lr, z: gan.generate(state.params_G, lr, z))
        out["exact_ms"] = round(de * 1e3, 2)
        out["exact_mvox_s"] = round(vox / de / 1e6, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
