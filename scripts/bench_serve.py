#!/usr/bin/env python
"""Full-volume serving benchmark on the real TPU.

Measures the production inference tier (eval/serve.py) end to end,
host round-trips included — unlike bench.py --infer, which times the raw
jitted forward on resident device buffers:

  1. the reference's full Bessaker volume (LR 32x32x10 -> HR 128x128x10,
     one direct `upscale` call), and
  2. a large 256x256-LR domain (HR 1024x1024x10) through the overlap-tiled
     path, batch=8 vs batch=1 tiles (reference-scale serving would loop
     single samples like test.py:106-121).

    python scripts/bench_serve.py [--tiled-reps N]

Prints one JSON line per case.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import build, setup_compile_cache  # noqa: E402


def main():
    reps = 3
    if "--tiled-reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--tiled-reps") + 1])

    setup_compile_cache()
    from gan_sr_wind_field_tpu.eval.serve import WindFieldSR

    gan, state, _, _, _ = build(1)
    sr = WindFieldSR(gan, state.params_G)
    rng = np.random.default_rng(0)

    def field(xy_lr, zl=10, s=4):
        lr = (rng.standard_normal((xy_lr, xy_lr, zl, 4)) * 0.1).astype(
            np.float32
        )
        zt = (
            np.cumsum(1.0 + rng.random((xy_lr * s, xy_lr * s, zl, 1)), axis=2)
            * 10.0
        ).astype(np.float32)
        return lr, zt

    # -- case 1: the reference full volume, one direct call ---------------
    lr, zt = field(32)
    sr.upscale(lr, zt)  # compile + warm
    n1, n2 = 4, 12
    t1 = min(_time(lambda: sr.upscale(lr, zt), n1) for _ in range(2))
    t2 = min(_time(lambda: sr.upscale(lr, zt), n2) for _ in range(2))
    dt = (t2 - t1) / (n2 - n1)
    vox = 128 * 128 * 10
    print(json.dumps({
        "case": "full_volume_lr32_hr128",
        "ms_per_volume": round(dt * 1e3, 2),
        "mvox_per_sec": round(vox / dt / 1e6, 2),
    }))

    # -- case 2: large-domain overlap-tiled serving ------------------------
    lr, zt = field(256)
    vox = 1024 * 1024 * 10
    for batch in (8, 1):
        sr.upscale_tiled(lr, zt, tile=64, overlap=16, batch=batch)  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = sr.upscale_tiled(lr, zt, tile=64, overlap=16, batch=batch)
        dt = (time.perf_counter() - t0) / reps
        assert np.isfinite(out).all()
        print(json.dumps({
            "case": f"tiled_lr256_hr1024_batch{batch}",
            "ms_per_volume": round(dt * 1e3, 2),
            "mvox_per_sec": round(vox / dt / 1e6, 2),
        }))

    # -- case 2b: device-side compute of the tiled pipeline, isolated from
    # the host link (over the axon tunnel the end-to-end number above is
    # dominated by link latency/bandwidth; on a co-located host the link
    # is PCIe and the compute number below is the realistic ceiling) ------
    import jax
    import jax.numpy as jnp

    zl, C, tile, batch, s = 10, 4, 64, 8, 4
    chunk_fn = sr._tiled_chunk_fn(tile, batch, zl, C)
    lr_d = jax.device_put(lr)
    zt_d = jax.device_put(zt)
    from gan_sr_wind_field_tpu.eval.serve import _cosine_window

    win1d = _cosine_window(tile * s)
    win_d = jax.device_put(
        np.outer(win1d, win1d)[:, :, None, None].astype(np.float32)
    )
    step = tile - 16
    X = Y = 256
    xs = sorted({min(x0, X - tile) for x0 in range(0, X, step)})
    coords = [(x0, y0) for x0 in xs for y0 in xs]

    def run_chunks():
        out = jnp.zeros((X * s, Y * s, zl, 3), jnp.float32)
        weight = jnp.zeros((X * s, Y * s, 1, 1), jnp.float32)
        for i in range(0, len(coords), batch):
            chunk = coords[i : i + batch]
            mask = np.ones(batch, np.float32)
            if len(chunk) < batch:
                mask[len(chunk):] = 0.0
                chunk = chunk + [chunk[-1]] * (batch - len(chunk))
            xs0 = np.asarray([c[0] for c in chunk], np.int32)
            ys0 = np.asarray([c[1] for c in chunk], np.int32)
            out, weight = chunk_fn(
                sr.params_G, lr_d, zt_d, out, weight, win_d, xs0, ys0, mask
            )
        return out, weight

    run_chunks()  # warm (already compiled by case 2)
    t0 = time.perf_counter()
    out, weight = run_chunks()
    _ = float(out[-1, -1, 0, 0]) + float(weight[-1, -1, 0, 0])  # fence
    dt_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = np.asarray(out / jnp.maximum(weight, 1e-12))
    dt_dl = time.perf_counter() - t0
    assert np.isfinite(res).all()
    print(json.dumps({
        "case": "tiled_lr256_hr1024_batch8_device",
        "compute_ms": round(dt_c * 1e3, 2),
        "result_download_ms": round(dt_dl * 1e3, 2),
        "mvox_per_sec_device": round(vox / dt_c / 1e6, 2),
    }))


def _time(fn, n):
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
