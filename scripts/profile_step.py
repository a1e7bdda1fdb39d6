#!/usr/bin/env python
"""Capture a device trace of the train step and print the top ops by time.

Parses the perfetto trace.json.gz that jax.profiler writes — no TensorBoard
needed.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench as bench_mod

    which = sys.argv[1] if len(sys.argv) > 1 else "g"
    out_dir = "/tmp/jax_trace"
    os.system(f"rm -rf {out_dir}")

    gan, state, lr, hr, z = bench_mod.build(32)
    for _ in range(3):
        state, m = gan.train_step(state, lr, hr, z, augment=True)
    jax.block_until_ready(m["total"])

    start_it = 0 if which == "g" else 50
    state = state.replace(it=jnp.int32(start_it))
    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        state, m = gan.train_step(state, lr, hr, z, augment=True)
    jax.block_until_ready(m["total"])
    jax.profiler.stop_trace()

    traces = glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no trace found", glob.glob(f"{out_dir}/**/*", recursive=True))
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    # aggregate complete events on device tracks
    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        # keep only XLA op events (they carry args with long_name/hlo)
        args = ev.get("args", {})
        if "long_name" not in args and "hlo_op" not in args and not name.startswith(("fusion", "convolution", "custom", "copy", "all-", "reduce", "transpose", "dynamic", "scatter", "gather", "select", "rng", "bitcast", "broadcast")):
            continue
        dur = ev.get("dur", 0) / 1e3  # ms
        durs[name] += dur
        counts[name] += 1
        total += dur

    top = sorted(durs.items(), key=lambda kv: -kv[1])[:30]
    print(f"== {which}-step trace: total attributed {total:.1f} ms over 3 steps ==")
    for name, d in top:
        print(f"{d:9.2f} ms  x{counts[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
