#!/usr/bin/env python
"""A/B the int8-quantized TRUNK (ops/quant_trunk.py) vs the bf16 Pallas
fused trunk on real TPU — the VERDICT r2 weak-2 settlement measurement.

    python scripts/probe_quant_trunk.py [--batches 32,128]

Variants timed per batch size (scalar-fence + N-vs-2N differencing):
  exact        bf16 Pallas fused trunk + bf16 head  (serving default)
  int8_trunk   int8 XLA trunk          + bf16 head
  int8_full    int8 XLA trunk          + int8 head  (everything int8)
Reports throughput + output agreement (rel RMS, PSNR vs exact).
One JSON line per batch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import build, setup_compile_cache  # noqa: E402


def main():
    batches = (32, 128)
    if "--batches" in sys.argv:
        batches = tuple(
            int(b) for b in
            sys.argv[sys.argv.index("--batches") + 1].split(",")
        )

    setup_compile_cache()
    import jax.numpy as jnp

    from gan_sr_wind_field_tpu.eval.serve import WindFieldSR

    for bs in batches:
        gan, state, lr, hr, z = build(bs)
        sr = WindFieldSR(gan, state.params_G)
        qt = sr.quantize_trunk(np.asarray(lr))
        qh = sr.quantize(np.asarray(lr))

        def run(gen, n):
            acc = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                out = gen(lr, z)
                acc = acc + jnp.mean(out)
            _ = float(acc)
            return time.perf_counter() - t0

        def timed(gen):
            run(gen, 2)
            t1 = min(run(gen, 6) for _ in range(2))
            t2 = min(run(gen, 18) for _ in range(2))
            return (t2 - t1) / 12

        gens = {
            "exact": lambda lr, z: gan.generate(state.params_G, lr, z),
            "int8_trunk": lambda lr, z: gan.generate_quantized(
                state.params_G, None, lr, z, qt
            ),
            "int8_full": lambda lr, z: gan.generate_quantized(
                state.params_G, qh, lr, z, qt
            ),
        }
        dts = {k: timed(g) for k, g in gens.items()}

        a = np.asarray(gens["exact"](lr, z))
        agree = {}
        for k in ("int8_trunk", "int8_full"):
            b = np.asarray(gens[k](lr, z))
            rel = float(np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12))
            mse = float(np.mean((b - a) ** 2))
            rng_sq = float((a.max() - a.min()) ** 2)
            agree[k] = {
                "rel_rms": round(rel, 5),
                "psnr_db": round(10 * np.log10(rng_sq / max(mse, 1e-30)), 1),
            }

        vox = bs * 64 * 64 * 10
        print(json.dumps({
            "batch": bs,
            **{f"{k}_ms": round(v * 1e3, 2) for k, v in dts.items()},
            **{f"{k}_mvox_s": round(vox / v / 1e6, 2)
               for k, v in dts.items()},
            "speedup_int8_trunk": round(dts["exact"] / dts["int8_trunk"], 3),
            "speedup_int8_full": round(dts["exact"] / dts["int8_full"], 3),
            "agreement": agree,
        }), flush=True)
        del gan, state, lr, hr, z, sr


if __name__ == "__main__":
    main()
