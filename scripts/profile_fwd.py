#!/usr/bin/env python
"""Op-level trace of the generator forward (no cond envelope)."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench as bench_mod

    out_dir = "/tmp/jax_trace_fwd"
    os.system(f"rm -rf {out_dir}")

    gan, state, lr, hr, z = bench_mod.build(32, use_remat=False)
    fwd = jax.jit(
        lambda p, a, b: jnp.sum(gan.G.apply({"params": p}, a, b, train=False))
    )
    float(fwd(state.params_G, lr, z))

    jax.profiler.start_trace(out_dir)
    acc = 0.0
    for _ in range(2):
        acc += float(fwd(state.params_G, lr, z))
    jax.profiler.stop_trace()

    traces = glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    # device-track complete events only (pid/tid heuristics: keep events with
    # args containing 'long_name' or XLA-ish names)
    durs, counts, names_long = defaultdict(float), defaultdict(int), {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        args = ev.get("args", {}) or {}
        dur = ev.get("dur", 0) / 1e3
        durs[name] += dur
        counts[name] += 1
        if "long_name" in args:
            names_long[name] = args["long_name"][:160]

    top = sorted(durs.items(), key=lambda kv: -kv[1])[:25]
    for name, d in top:
        print(f"{d:9.2f} ms x{counts[name]:<4d} {name[:60]} :: "
              f"{names_long.get(name, '')[:100]}")


if __name__ == "__main__":
    main()
