#!/usr/bin/env python
"""Isolate the train-LOOP overhead over the tunnel vs the bare step rate.

Round-5 measured gap: the 8x fullvol evidence run stepped at 685 ms/it
end-to-end while the differenced bare-step probe says 291 ms
(docs/evidence/fullvol8x3k.md); the 4x milestone runs show ~115 ms/it of
the same kind of overhead (397 ms/it vs a 282 ms G/D-blend step). This
probe times, in ONE process on the real TPU, per geometry:

  A. probe-style: fixed device arrays -> train_step, N its, scalar fence
     (differenced N-vs-2N — the bench number, dispatch cost cancelled)
  B. loop-style: per-it `slice_batch` dispatch (the DeviceBatcher
     pattern: fold_in + jitted slice + train_step), scalar fence at the
     end only — exactly the hot loop's dispatch sequence, wall-clocked
     the way training experiences it (NOT differenced)
  C. as B but with the fixed arrays of A (isolates slice dispatch vs
     per-it dispatch latency)

    python scripts/probe_loop_overhead.py [--scales 4 8] [--its 30]

Prints one JSON line per scale.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build, setup_compile_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="*", default=[8, 4])
    ap.add_argument("--its", type=int, default=30)
    args = ap.parse_args()
    setup_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_sr_wind_field_tpu.data.device_data import slice_batch

    for scale in args.scales:
        fullvol = scale != 4
        if fullvol:
            batch, size = 8, 128
            gan, state, lr, hr, z = build(
                batch, scale=scale, size=size, no_adv=True
            )
            P = Py = size
            slicing = False
        else:
            batch, size = 32, 64
            gan, state, lr, hr, z = build(batch)
            P = Py = size
            slicing = False  # resident block at patch size: plain gather
        # fake resident split, realistic shape: 192 fields at (P,Py,10,5)
        nres = 48  # enough for realistic gather strides; keeps HBM modest
        rng = np.random.default_rng(0)
        full = jnp.asarray(
            rng.standard_normal((nres, P, Py, 10, 4)).astype(np.float32)
        )
        zraw = jnp.asarray(
            np.cumsum(
                1.0 + rng.random((nres, P, Py, 10, 1)).astype(np.float32),
                axis=3,
            )
        )
        import functools

        make = jax.jit(functools.partial(
            slice_batch, batch_size=batch, patch=P, patch_y=Py,
            cf=scale, enable_slicing=slicing,
        ))
        key = jax.random.key(0)

        # warm up both graphs
        for _ in range(2):
            lr_b, hr_b, z_b = make(full, zraw, key)
            state, m = gan.train_step(state, lr_b, hr_b, z_b, augment=True)
        _ = float(m["total"])

        def loop_a(n, st):
            t0 = time.perf_counter()
            s = st
            for _ in range(n):
                s, mm = gan.train_step(s, lr, hr, z, augment=True)
            _ = float(mm["total"])
            return time.perf_counter() - t0

        # A: differenced (bench-style)
        na, nb = args.its // 3, args.its
        ta = min(loop_a(na, state) for _ in range(2))
        tb = min(loop_a(nb, state) for _ in range(2))
        step_ms = (tb - ta) / (nb - na) * 1e3

        # B: loop-style wall clock, batcher dispatch pattern
        def loop_b(n, st):
            t0 = time.perf_counter()
            s = st
            cnt = 0
            for _ in range(n):
                k = jax.random.fold_in(key, cnt)
                cnt += 1
                lr_b, hr_b, z_b = make(full, zraw, k)
                s, mm = gan.train_step(s, lr_b, hr_b, z_b, augment=True)
            _ = float(mm["total"])
            return time.perf_counter() - t0

        wall_b_ms = min(loop_b(args.its, state) for _ in range(2)) \
            / args.its * 1e3

        # C: loop-style wall clock, fixed arrays (no slice dispatch)
        wall_c_ms = min(loop_a(args.its, state) for _ in range(2)) \
            / args.its * 1e3

        print(json.dumps({
            "scale": scale,
            "batch": batch,
            "step_ms_differenced": round(step_ms, 1),
            "wall_ms_loop_with_slice": round(wall_b_ms, 1),
            "wall_ms_loop_fixed": round(wall_c_ms, 1),
            "overhead_slice_ms": round(wall_b_ms - wall_c_ms, 1),
            "overhead_dispatch_ms": round(wall_c_ms - step_ms, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
