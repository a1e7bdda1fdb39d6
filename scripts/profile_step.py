#!/usr/bin/env python
"""Profile the jitted train step on the real TPU and print a per-op table.

Usage:
    python scripts/profile_step.py [--phase g|d] [--steps N] [--top K]

Traces N consecutive steps of one alternation phase (G block starts at it=0,
D block at it=50 for the bench config), parses the .trace.json.gz XLA ops
track, and prints the top-K device ops by total duration, normalised
per step. This is the tool behind the G/D-step profile maps in CLAUDE.md —
jax.profiler works over the axon tunnel; `block_until_ready` does not fence
reliably there, so the run is fenced by fetching a scalar metric.
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["g", "d"], default="g")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from bench import build, setup_compile_cache

    setup_compile_cache()

    gan, state, lr, hr, z = build(args.batch)
    start_it = 0 if args.phase == "g" else 50

    # warm/compile both branches
    for _ in range(2):
        state, m = gan.train_step(state, lr, hr, z, augment=True)
    _ = float(m["total"])

    # the alternation runs in 50-it blocks (d_g_train_period); more steps
    # than the block would silently mix the other phase into the profile
    if args.steps > 50:
        print(f"clamping --steps {args.steps} -> 50 (one alternation "
              "block; more would mix G and D phases)", file=sys.stderr)
        args.steps = 50

    state = state.replace(it=jnp.int32(start_it))
    tdir = tempfile.mkdtemp(prefix="windsr_trace_")
    jax.profiler.start_trace(tdir)
    for _ in range(args.steps):
        state, m = gan.train_step(state, lr, hr, z, augment=True)
    _ = float(m["total"])  # scalar fence
    jax.profiler.stop_trace()

    traces = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print("no trace produced", file=sys.stderr)
        sys.exit(1)
    with gzip.open(max(traces, key=os.path.getmtime), "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # device-side complete events: pick the pids whose process names look
    # like an accelerator ("/device:TPU", "TPU", "Device") rather than host
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "device" in n.lower()}

    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        durs[name] += dur
        counts[name] += 1
        total += dur

    per_step = {k: v / args.steps for k, v in durs.items()}
    print(f"# phase={args.phase} steps={args.steps} "
          f"device-total {total/args.steps:.1f} ms/step "
          f"({len(durs)} distinct ops)")
    for name, ms in sorted(per_step.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ms:9.2f} ms  x{counts[name]//args.steps:<3d} {name[:120]}")


if __name__ == "__main__":
    main()
