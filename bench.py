#!/usr/bin/env python
"""Headline benchmark: GAN train-step throughput (HR voxels/sec/chip).

Replicates the reference's cluster training workload
(config/wind_field_GAN_3D_config_cluster.ini: 4x upscale, 64×64×10 HR
patches, batch 32, full RRDB generator + discriminator, physics losses,
relativistic-average GAN, instance noise) as the jitted TPU train step and
measures steady-state throughput across a full G-block/D-block alternation
cycle.

Baseline (BASELINE.md): the reference pins a 3-day A100 walltime budget for
niter=150 000 at this exact workload → 0.579 it/s → 758 000 HR-voxels/s.
``vs_baseline`` is measured/758k.

Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np

BASELINE_VOXELS_PER_SEC = 150_000 / (3 * 24 * 3600) * 32 * 64 * 64 * 10


def setup_compile_cache(min_compile_secs: float = 5.0) -> None:
    """Persistent compile cache: the full train-step compile runs many
    minutes over the remote TPU tunnel; reuse it across invocations."""
    import os

    import jax

    try:
        cache_dir = os.environ.get(
            "WINDSR_BENCH_CACHE", "/tmp/jax_bench_cache"
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception as e:
        print(f"# compilation cache unavailable: {e}", file=sys.stderr)


def build(batch_size: int, use_remat: bool = False, scale: int = 4,
          size: int = 64, no_adv: bool = False):
    # measured on v5e: batch 32 fits HBM without remat; remat costs +18% G-step
    # time (758→623 ms without). Larger volumes/batches should re-enable it.
    import jax

    from gan_sr_wind_field_tpu.config import Config
    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    cfg = Config()
    cfg.scale = scale
    cfg.compute_dtype = "bfloat16"
    # fused Pallas RRDB trunk for the D branch's no-grad G forward
    # (measured: G forward 390->304 ms at this geometry)
    cfg.use_fused_trunk = True
    # fused Pallas physics stencil (G step 520.1 -> 516.8 ms measured)
    cfg.use_pallas_stencil = True
    # Pallas HR-head kernel: OFF — wins standalone (67.6 -> 49.3 ms) but
    # loses in-graph (G fwd 130.4 -> 138.4, blended 3.99 -> 3.77 Mvox/s):
    # XLA's in-context schedule for hr_conv0 beats its standalone layout
    # by more than the kernel's lane-packing gain (see ops/pallas/hr_head.py)
    cfg.use_pallas_head = False
    # 64 MiB scoped-VMEM budget for the XLA:TPU conv emitter — measured
    # G step 424.9→406.8 ms on v5e (scripts/probe_xla_opts.py sweep; the
    # compiler default ~16 MiB under-tiles the k5³ head convs). Override
    # with WINDSR_SCOPED_VMEM_KIB=0 for an A/B baseline.
    import os as _os
    cfg.xla_scoped_vmem_limit_kib = int(
        _os.environ.get("WINDSR_SCOPED_VMEM_KIB", "65536")
    )
    # hr_conv0 forward as full-lane main conv + tap-stacked remainder on
    # the NO-GRAD forwards (D steps / inference) — measured D step
    # 160.8→156.2 ms; regresses in the G-train graph, so nograd-only.
    # WINDSR_SPLIT_HR_OUT=0 for an A/B baseline.
    cfg.split_hr_out_nograd = (
        _os.environ.get("WINDSR_SPLIT_HR_OUT", "1") == "1"
    )
    cfg.gan_config.include_pressure = False
    cfg.gan_config.include_z_channel = True
    cfg.gan_config.number_of_z_layers = 10
    cfg.gan_config.enable_slicing = size == 64
    cfg.gan_config.slice_size = size
    g = cfg.generator
    g.num_features = 128
    g.num_RRDB = 16
    g.num_RDB_convs = 5
    g.RDB_growth_chan = 32
    g.hr_kern_size = 5
    g.lff_kern_size = 1
    g.terrain_number_of_features = 16
    g.dropout_probability = 0.1
    g.use_remat = use_remat
    cfg.discriminator.num_features = 32
    t = cfg.training
    t.niter = 150000
    t.d_g_train_period = 50
    t.d_g_train_ratio = 1
    t.use_instance_noise = True
    t.use_one_sided_label_smoothing = True
    t.gradient_xy_loss_weight = 3.064
    t.gradient_z_loss_weight = 0.0
    t.xy_divergence_loss_weight = 0.721
    t.divergence_loss_weight = 0.366
    t.pixel_loss_weight = 0.136
    t.adversarial_loss_weight = 0.0005
    if no_adv:
        # reference *_pix4_no_adv recipes: G-only pixel-dominant training,
        # no discriminator in the graph (use_adv gating in train/gan.py)
        t.d_g_train_ratio = 0
        t.adversarial_loss_weight = 0.0
        t.feature_D_loss_weight = 0.0
        t.pixel_loss_weight = 4.0

    zl = 10
    x = np.arange(size, dtype=np.float32) * 150.0
    gan = WindFieldGAN(cfg, x, x)

    rng = np.random.default_rng(0)
    lr_shape = (batch_size, size // scale, size // scale, zl, 4)
    hr_shape = (batch_size, size, size, zl, 3)
    state = gan.init_state(jax.random.key(0), lr_shape, hr_shape)
    lr = jax.device_put(rng.standard_normal(lr_shape).astype(np.float32) * 0.1)
    hr = jax.device_put(rng.standard_normal(hr_shape).astype(np.float32) * 0.1)
    z = jax.device_put(
        (np.cumsum(1.0 + rng.random((batch_size, size, size, zl, 1)), axis=3)
         * 10.0).astype(np.float32)
    )
    return gan, state, lr, hr, z


def _flops_per_pair(gan, state, lr, hr, z):
    """Total FLOPs for one G-step + one D-step from XLA's cost analysis of
    the compiled train step (both lax.cond branches are counted once each in
    the single program, which is exactly one G/D pair)."""
    import jax

    try:
        # reuse the session's already-compiled jit (same donation/cache key
        # as the timed steps) — a fresh jax.jit wrapper would trigger a
        # second multi-minute remote compile of the whole train step
        compiled = (
            gan._jit_train_step
            .lower(state, lr, hr, z, None, augment=True)
            .compile()
        )
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


# Peak bf16 matmul throughput used for the MFU estimate (per chip).
PEAK_FLOPS = {"v5 lite": 197e12, "v4": 275e12}


def main(retry_reason=None):
    import jax

    setup_compile_cache()

    batch_size = 32
    while True:
        try:
            gan, state, lr, hr, z = build(batch_size)
            # warmup/compile: cross a G/D boundary so both branches run
            for _ in range(3):
                state, m = gan.train_step(state, lr, hr, z, augment=True)
            jax.block_until_ready(m["total"])
            break
        except Exception as e:  # OOM → halve the batch
            if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
                batch_size //= 2
                if batch_size < 1:
                    raise
                print(f"# OOM, retrying with batch {batch_size}",
                      file=sys.stderr)
            else:
                raise

    import jax.numpy as jnp

    # Timing methodology: the steps are chained through the donated state
    # (hard data dependency) and the run is fenced by fetching a SCALAR metric
    # to host — `block_until_ready` alone is not a reliable fence on remote
    # runtimes. N-vs-2N differencing cancels dispatch/fetch latency.
    def run_block(start_it, n_steps):
        nonlocal state
        state = state.replace(it=jnp.int32(start_it))
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, m = gan.train_step(state, lr, hr, z, augment=True)
        _ = float(m["total"])  # scalar fence
        return time.perf_counter() - t0

    def timed_block(start_it, n_small=6, n_big=18, passes=2):
        # best-of-N passes: one-off tunnel stalls have inflated a single
        # pass by ~40% (observed 229 vs 165 ms D step back-to-back). Take
        # min(t_small) and min(t_big) SEPARATELY before differencing — a
        # stall landing in a small block would otherwise bias the
        # differenced estimate low and min() would select exactly that.
        run_block(start_it, 2)  # warm
        t_small = min(run_block(start_it, n_small) for _ in range(passes))
        t_big = min(run_block(start_it, n_big) for _ in range(passes))
        return (t_big - t_small) / (n_big - n_small)

    t_g = timed_block(0)  # its 1..18: all G (period 50)
    t_d = timed_block(50)  # its 51..68: all D
    per_pair = t_g + t_d

    voxels = batch_size * 64 * 64 * 10
    vps = 2 * voxels / per_pair

    # --- North-star accounting -------------------------------------------
    # MFU: XLA-counted FLOPs for one G+D pair over the measured pair time,
    # against the chip's peak bf16 matmul rate.
    pair_flops = _flops_per_pair(gan, state, lr, hr, z)
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_FLOPS.items() if k in kind), None)
    mfu = (
        round(pair_flops / per_pair / peak, 4)
        if pair_flops and peak else None
    )
    # v4-8 projection toward the >=20x target: measured per-chip throughput
    # x peak-FLOPs ratio (v4/v5e bf16) x 4 chips x DP efficiency. A "v4-8"
    # slice is 8 TensorCores = 4 megacore chips (PEAK_FLOPS["v4"] is
    # per-chip, both cores). The projection uses DP_EFF=0.95; the JSON
    # carries the supporting bandwidth arithmetic (computed from the actual
    # parameter trees) so the bound is auditable: a ring all-reduce of the
    # fp32 grads moves 2*B*(n-1)/n bytes per chip, and even at a single
    # ICI link's one-way bandwidth the implied comm time is <2% of the
    # v4-scaled step — 0.95 is conservative. No multi-chip hardware exists
    # in this environment to measure it directly; the dp mesh path is
    # parity-tested on the 8-device virtual mesh (tests/test_parallel.py).
    DP_EFF = 0.95
    V48_CHIPS = 4
    v48_vps = (
        vps * (PEAK_FLOPS["v4"] / peak if peak else 1.0) * V48_CHIPS * DP_EFF
    )
    # --- auditable dp_efficiency bound ----------------------------------
    def _tree_bytes(tree, bytes_per_param=4):  # fp32 grads
        import jax
        return sum(
            int(np.prod(x.shape)) * bytes_per_param
            for x in jax.tree.leaves(tree)
        )
    grad_bytes_g = _tree_bytes(state.params_G)
    grad_bytes_d = _tree_bytes(state.params_D)
    # per G/D pair each step all-reduces only its own grads; ring all-reduce
    # moves 2*B*(n-1)/n bytes through each chip's ICI
    ar_bytes_pair = 2 * (grad_bytes_g + grad_bytes_d) * (V48_CHIPS - 1) / V48_CHIPS
    ICI_BW_GBPS = 45.0  # one v4 ICI link, one-way (public v4 spec ~50 GB/s;
    # a 2x2 slice has >=2 usable links/chip, so this is a lower bound)
    comm_s_pair = ar_bytes_pair / (ICI_BW_GBPS * 1e9)
    pair_s_v4 = per_pair * (peak / PEAK_FLOPS["v4"] if peak else 1.0)
    dp_eff_bound = 1.0 - comm_s_pair / (pair_s_v4 + comm_s_pair)
    out = {
        "metric": "train_step_voxels_per_sec_per_chip",
        "value": round(vps, 1),
        "unit": "HR voxels/s",
        "vs_baseline": round(vps / BASELINE_VOXELS_PER_SEC, 2),
        "detail": {
            "batch": batch_size,
            "g_step_ms": round(t_g * 1e3, 2),
            "d_step_ms": round(t_d * 1e3, 2),
            "pair_gflops": round(pair_flops / 1e9, 1) if pair_flops else None,
            "mfu": mfu,
            "device_kind": kind,
            "v4_8_projection": {
                "voxels_per_sec": round(v48_vps, 1),
                "vs_baseline": round(v48_vps / BASELINE_VOXELS_PER_SEC, 2),
                "dp_efficiency_used": DP_EFF,
                "dp_efficiency_bound": {
                    "grad_bytes_G_fp32": grad_bytes_g,
                    "grad_bytes_D_fp32": grad_bytes_d,
                    "ring_allreduce_bytes_per_chip_per_pair": int(
                        ar_bytes_pair
                    ),
                    "ici_bw_assumed_GBps_oneway_single_link": ICI_BW_GBPS,
                    "comm_ms_per_pair": round(comm_s_pair * 1e3, 2),
                    "pair_ms_v4_scaled": round(pair_s_v4 * 1e3, 1),
                    "efficiency_bound_no_overlap": round(dp_eff_bound, 4),
                },
                "assumptions": "peak-FLOPs ratio v4/v5e, 4 megacore chips "
                               "(8 TensorCores); dp_efficiency bound "
                               "computed from actual param trees (see "
                               "dp_efficiency_bound), virtual-mesh "
                               "parity-tested only",
            },
        },
    }
    if retry_reason:
        out["retried"] = retry_reason
    print(json.dumps(out))


def main_infer(batches=(64, 128), int8_trunk=False):
    """Serving probe (`bench.py --infer`): no-grad generator throughput.

    The reference has no serving tier — its inference is single-sample
    ``gan.G(LR)`` calls inside test.py:106-121. Here inference is the jitted
    eval-mode forward (``WindFieldGAN.generate``: fused Pallas trunk +
    tap-stacked head), the same path `eval/serve.py` uses. Larger batches
    are legal for serving (no activation-gradient memory); the sweep over
    {32,64,96,128,192,256} measured a clean knee at 128 (10.50 / 11.91 /
    12.57 / 11.92 / 9.03 Mvox/s at 64/96/128/192/256), so the probe reports
    the training batch-adjacent 64 and the serving optimum 128.

    ``--infer_int8`` additionally times the calibrated int8-trunk path
    (`ops/quant_trunk.py`, the `--serve_int8_trunk` serving graph) at each
    batch — the large-batch throughput lever (measured 1.305x at the
    128 knee; collapses above 128, scripts/probe_int8_knee.py).
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    setup_compile_cache()

    per_batch = {}
    for bs in batches:
        gan, state, lr, hr, z = build(bs)

        gen = lambda lr, z: gan.generate(state.params_G, lr, z)  # noqa: E731
        if int8_trunk:
            from gan_sr_wind_field_tpu.eval.serve import WindFieldSR

            qt = WindFieldSR(gan, state.params_G).quantize_trunk(
                np.asarray(lr)
            )
            gen = lambda lr, z: gan.generate_quantized(  # noqa: E731
                state.params_G, None, lr, z, qt
            )

        # scalar accumulator fences every call without serialising them —
        # back-to-back dispatch is the realistic serving schedule
        def run(n):
            acc = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                out = gen(lr, z)
                acc = acc + jnp.mean(out)
            _ = float(acc)
            return time.perf_counter() - t0

        run(2)  # compile + warm
        # per-block minima across passes before differencing, like
        # timed_block in main(): one-off tunnel stalls otherwise corrupt
        # whichever block they land in
        n_small, n_big = 8, 24
        t_small = min(run(n_small) for _ in range(2))
        t_big = min(run(n_big) for _ in range(2))
        dt = (t_big - t_small) / (n_big - n_small)
        per_batch[bs] = {
            "ms_per_call": round(dt * 1e3, 2),
            "voxels_per_sec": round(bs * 64 * 64 * 10 / dt, 1),
        }
        del gan, state, lr, hr, z

    best = max(per_batch.values(), key=lambda d: d["voxels_per_sec"])
    print(json.dumps({
        "metric": ("infer_int8_trunk_voxels_per_sec_per_chip"
                   if int8_trunk else "infer_voxels_per_sec_per_chip"),
        "value": best["voxels_per_sec"],
        "unit": "HR voxels/s",
        "vs_baseline": round(best["voxels_per_sec"] / BASELINE_VOXELS_PER_SEC, 2),
        "detail": {"per_batch": per_batch,
                   "device_kind": jax.devices()[0].device_kind},
    }))


if __name__ == "__main__":
    if "--infer" in sys.argv or "--infer_int8" in sys.argv:
        main_infer(int8_trunk="--infer_int8" in sys.argv)
        sys.exit(0)
    try:
        main()
    except Exception as e:  # remote-tunnel runs can flake; one clean retry
        reason = f"{type(e).__name__}: {e}"
        print(f"# bench attempt failed ({reason}), retrying", file=sys.stderr)
        main(retry_reason=reason[:300])
