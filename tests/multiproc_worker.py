"""Worker for the two-process jax.distributed test (test_multiprocess.py).

Run as: python multiproc_worker.py <coordinator> <num_procs> <proc_id> <tmpdir>

Exercises the real multi-host code paths on two local CPU processes:
`jax.distributed.initialize`, global-batch assembly from process-local
shards (data/pipeline.prefetch_to_device →
`make_array_from_process_local_data`), a shared SPMD train step on a
2-device 'data' mesh, and collective checkpoint save with process-0-only
pruning (train/checkpoint.py). Prints one MET line the parent compares
across processes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon,cpu
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(coordinator: str, n_proc: int, pid: int, tmpdir: str) -> None:
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=n_proc, process_id=pid
    )
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.local_devices()) == 1
    assert len(jax.devices()) == n_proc

    import numpy as np

    from gan_sr_wind_field_tpu.config import Config
    from gan_sr_wind_field_tpu.data.pipeline import prefetch_to_device
    from gan_sr_wind_field_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        shard_state,
    )
    from gan_sr_wind_field_tpu.train import checkpoint as ckpt
    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    cfg = Config()
    cfg.scale = 4
    cfg.compute_dtype = "float32"
    cfg.gan_config.include_pressure = False
    cfg.gan_config.include_z_channel = True
    cfg.gan_config.number_of_z_layers = 4
    cfg.gan_config.enable_slicing = True
    cfg.gan_config.slice_size = 16
    g = cfg.generator
    g.num_features = 8
    g.num_RRDB = 1
    g.num_RDB_convs = 2
    g.RDB_growth_chan = 4
    g.hr_kern_size = 3
    g.terrain_number_of_features = 4
    g.use_remat = False
    cfg.discriminator.num_features = 4
    cfg.training.d_g_train_period = 2
    cfg.training.save_model_period = 1

    mesh = make_mesh(data_parallel=n_proc, devices=jax.devices())
    sharding = batch_sharding(mesh)

    x = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x, mesh=mesh)

    # global batch 2 = one local sample per process; values differ per
    # process so the metric proves cross-host assembly (identical metrics
    # on both processes require both shards)
    rng = np.random.default_rng(100 + pid)
    lr_l = rng.standard_normal((1, 4, 4, 4, 4)).astype(np.float32) * 0.1
    hr_l = rng.standard_normal((1, 16, 16, 4, 3)).astype(np.float32) * 0.1
    z_l = np.cumsum(
        1.0 + rng.random((1, 16, 16, 4, 1)), axis=3
    ).astype(np.float32)

    batches = prefetch_to_device(iter([(lr_l, hr_l, z_l)]), sharding=sharding)
    lr_g, hr_g, z_g = next(batches)
    assert lr_g.shape[0] == n_proc  # global batch across processes

    state = gan.init_state(jax.random.key(0), (2, 4, 4, 4, 4),
                           (2, 16, 16, 4, 3))
    state = shard_state(state, mesh)

    # compile before executing any cross-process collective: gloo's context
    # init times out (30s) if one process is still compiling when the other
    # enters the collective, so AOT-compile then barrier
    gan._jit_train_step.lower(state, lr_g, hr_g, z_g,
                              augment=False).compile()
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier("compiled", 300_000)

    metrics = []
    run_folder = os.path.join(tmpdir, "run")
    os.makedirs(run_folder, exist_ok=True)
    for _ in range(2):
        state, m = gan.train_step(state, lr_g, hr_g, z_g)
        metrics.append(float(m["total"]) + float(m["D_train_loss"]))
        # collective save every step; keep_last=1 prunes (process 0 only)
        ckpt.save_checkpoint(run_folder, state, keep_last=1)

    kept = sorted(n for n in os.listdir(run_folder) if n.startswith("ckpt_"))
    print(f"MET {pid} {metrics[0]:.9f} {metrics[1]:.9f} kept={','.join(kept)}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
