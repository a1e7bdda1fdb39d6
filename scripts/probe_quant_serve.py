#!/usr/bin/env python
"""A/B the int8-quantized serving head vs the exact bf16 path on real TPU.

    python scripts/probe_quant_serve.py [--batches 32,128]

For each batch size: calibrates the head on the probe inputs, times the
exact and quantized jitted forwards (scalar-fence + N-vs-2N differencing,
see bench.py), and reports the output agreement (relative RMS + PSNR of
quantized vs exact — the int8 rounding sits at the bf16 noise floor, so
this should be well above the SR task's own ~35 dB PSNR band).
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

        gen_exact = lambda lr, z: gan.generate(state.params_G, lr, z)
        gen_q = lambda lr, z: gan.generate_quantized(
            state.params_G, qh, lr, z
        )
        dt_e = timed(gen_exact)
        dt_q = timed(gen_q)

        a = np.asarray(gen_exact(lr, z))
        b = np.asarray(gen_q(lr, z))
        rel = float(np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12))
        mse = float(np.mean((b - a) ** 2))
        rng_sq = float((a.max() - a.min()) ** 2)
        psnr_vs_exact = 10 * np.log10(rng_sq / max(mse, 1e-30))

        vox = bs * 64 * 64 * 10
        print(json.dumps({
            "batch": bs,
            "exact_ms": round(dt_e * 1e3, 2),
            "int8_ms": round(dt_q * 1e3, 2),
            "speedup": round(dt_e / dt_q, 3),
            "exact_mvox_s": round(vox / dt_e / 1e6, 2),
            "int8_mvox_s": round(vox / dt_q / 1e6, 2),
            "rel_rms_vs_exact": round(rel, 5),
            "psnr_vs_exact_db": round(psnr_vs_exact, 1),
        }), flush=True)
        del gan, state, lr, hr, z, sr


if __name__ == "__main__":
    main()
