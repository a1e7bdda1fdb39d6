#!/usr/bin/env python
"""HTTP inference-daemon throughput on the real TPU.

Measures the FULL serving stack end to end — HTTP clients -> npz decode ->
micro-batcher -> jitted TPU forward -> npz responses — at the training
patch geometry bench.py --infer uses for its raw-device number (LR
16x16x10x4 -> SR 64x64x10x3 at scale 4, the reference cluster workload of
config/wind_field_GAN_3D_config_cluster.ini), so the daemon's overhead
over the resident-buffer ceiling (12.57 Mvox/s at the batch-128 knee) is
directly readable.

Clients each POST batch-B requests in a closed loop; submit_many splits
them into jobs that stack in the shared dispatcher queue, so with
C x B >= max_batch in flight the device sees full batches. Only
mid-window completions count (ramp/drain excluded).

    python scripts/probe_serve_http.py [--clients 4] [--batch 32]
        [--seconds 30] [--max-batch 128]

Prints one JSON line.
"""

import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import build, setup_compile_cache  # noqa: E402


def _arg(flag, default, cast=int):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv \
        else default


def main():
    clients = _arg("--clients", 4)
    batch = _arg("--batch", 32)
    seconds = _arg("--seconds", 30)
    max_batch = _arg("--max-batch", 128)

    setup_compile_cache()
    from gan_sr_wind_field_tpu.eval.serve import WindFieldSR
    from gan_sr_wind_field_tpu.eval.server import serve, warmup

    gan, state, _, _, _ = build(1)
    sr = WindFieldSR(gan, state.params_G)
    rng = np.random.default_rng(0)
    zl, s, p = 10, 4, 16
    lr1 = (rng.standard_normal((p, p, zl, 4)) * 0.1).astype(np.float32)
    z1 = (np.cumsum(1.0 + rng.random((p * s, p * s, zl, 1)), axis=2)
          * 10.0).astype(np.float32)

    # bound compile variants: the dispatcher mixes jobs from all clients,
    # and drain-remainder grabs can be SMALLER than batch (e.g. 3 jobs
    # left pad to 4) as well as larger — warm EVERY pow2 pad from 1 up to
    # max_batch (plus batch itself), or an online remote compile
    # (minutes) lands inside the measured window. The small-batch
    # compiles are cheap relative to one online compile skewing the run.
    sizes = {batch, max_batch}
    b = 1
    while b <= max_batch:
        sizes.add(b)
        b *= 2
    sizes = sorted(sizes)
    print(f"warming batch sizes {sizes} (remote compiles take minutes)",
          file=sys.stderr)
    warmup(sr, lr1.shape, z1.shape, sizes)

    srv = serve(sr, host="127.0.0.1", port=0, max_batch=max_batch,
                max_wait_ms=20.0)
    host, port = srv.server_address
    url = f"http://{host}:{port}/v1/upscale"
    lr = np.stack([lr1] * batch)
    z = np.stack([z1] * batch)
    buf = io.BytesIO()
    np.savez(buf, lr=lr, z=z)
    body = buf.getvalue()

    t_open = time.perf_counter() + 5.0          # ramp
    t_close = t_open + seconds                  # measured window
    counted = [0] * clients
    errors = []
    stop = threading.Event()

    def client(i):
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(url, data=body, method="POST")
                with urllib.request.urlopen(req, timeout=600) as r:
                    out = np.load(io.BytesIO(r.read()))["sr"]
                assert out.shape == (batch, p * s, p * s, zl, 3)
            except Exception as e:  # pragma: no cover - diagnostics
                errors.append(repr(e))
                return
            t1 = time.perf_counter()
            if t0 >= t_open and t1 <= t_close:
                counted[i] += batch
            if t1 >= t_close:
                return

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=900)
    stop.set()
    wall = time.perf_counter() - t_start

    stats = json.loads(urllib.request.urlopen(
        f"http://{host}:{port}/v1/stats", timeout=30).read())
    srv.close()

    vols = sum(counted)
    vox = vols * (p * s) * (p * s) * zl
    mvox = vox / seconds / 1e6
    out = {
        "metric": "http_serve_voxels_per_sec",
        "value": round(mvox * 1e6),
        "mvox_per_s": round(mvox, 3),
        "unit": "HR-voxels/s",
        "clients": clients,
        "client_batch": batch,
        "max_batch": max_batch,
        "window_s": seconds,
        "volumes_counted": vols,
        "wall_s": round(wall, 1),
        "errors": errors[:3],
        "batcher": {k: stats.get(k) for k in
                    ("requests", "batches", "batched_samples",
                     "padded_samples", "max_batch_seen",
                     "request_latency", "batch_duration")
                    if k in stats},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
