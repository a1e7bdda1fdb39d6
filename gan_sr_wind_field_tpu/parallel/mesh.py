"""Device-mesh construction and sharding rules.

The reference is strictly single-device (run.py:265-271); this module is the
SPMD upgrade (SURVEY.md §2.2). Strategy:

- **data axis**: batch dimension of LR/HR/Z sharded across 'data'. Gradient
  all-reduce and the global max-reductions inside the physics losses become
  XLA `psum`s over ICI — inserted automatically by GSPMD from the sharding
  annotations (no hand-written collectives in the train step).
- **model axis** (tensor parallel): output channels of every generator conv
  kernel (DHWIO dim -1) sharded across 'model'; XLA partitions the convs and
  inserts the channel all-gathers/reduce-scatters where dataflow requires.
  With nf=128 the shards stay MXU-aligned down to tp=8 (16 lanes).
- D's BatchNorm batch statistics are logically global means over the sharded
  batch — XLA computes cross-replica stats correctly under jit (the thing the
  reference never had to face, SURVEY.md §7).

Everything works identically on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`) for tests and dry runs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_parallel: int = -1,
    tensor_parallel: int = 1,
    spatial_parallel: int = 1,
    devices=None,
) -> Mesh:
    """('data', 'model'[, 'spatial']) mesh. data=-1 → all remaining devices.

    The 'spatial' axis (created only when spatial_parallel > 1) shards the x
    spatial dimension of the volumes: GSPMD spatially partitions every conv,
    inserting the halo exchanges (collective-permutes over ICI) for the
    receptive fields automatically — the TPU-native route to full-volume
    training beyond one chip's HBM (SURVEY.md §5 "long-context" equivalent).
    """
    devices = list(devices if devices is not None else jax.devices())
    if data_parallel == -1:
        data_parallel = max(
            1, len(devices) // (tensor_parallel * spatial_parallel)
        )
    n = data_parallel * tensor_parallel * spatial_parallel
    if n > len(devices):
        raise ValueError(
            f"mesh {data_parallel}x{tensor_parallel}x{spatial_parallel} "
            f"needs {n} devices, have {len(devices)}"
        )
    if spatial_parallel > 1:
        arr = mesh_utils.create_device_mesh(
            (data_parallel, tensor_parallel, spatial_parallel),
            devices=devices[:n],
        )
        return Mesh(arr, ("data", "model", "spatial"))
    arr = mesh_utils.create_device_mesh(
        (data_parallel, tensor_parallel), devices=devices[:n]
    )
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def volume_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (N, X, Y, Z, C) volumes: batch over 'data', x over 'spatial'.

    Identical to `batch_sharding` on meshes without a spatial axis. Used for
    LR, HR and Z alike (all are rank-5 with x at dim 1); XLA reshards
    LR→HR-resolution tensors through the generator automatically.
    """
    if "spatial" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _place(x, sharding: NamedSharding):
    """Place one array with ``sharding``, multi-host aware.

    On pods `jax.device_put` rejects shardings that span non-addressable
    devices; every process holds the full (identically-computed) array, so
    assemble the global array from the process-local copy instead. Typed
    PRNG keys round-trip through their raw key data."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    # global_shape must be passed explicitly: every process holds the FULL
    # array, and without it make_array_from_process_local_data infers the
    # global extent as if each host contributed only its own slice —
    # inflating any dimension whose sharding axis spans processes
    if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
        raw = np.asarray(jax.random.key_data(x))
        kd = jax.make_array_from_process_local_data(
            sharding, raw, global_shape=raw.shape
        )
        return jax.random.wrap_key_data(kd)
    arr = np.asarray(x)
    return jax.make_array_from_process_local_data(
        sharding, arr, global_shape=arr.shape
    )


def _param_spec(path_str: str, leaf, tp: int) -> P:
    """Tensor-parallel spec for one parameter leaf.

    Conv kernels are DHWIO — shard O (dim -1) over 'model' when divisible.
    BatchNorm scale/bias and anything indivisible stays replicated.
    """
    if tp <= 1:
        return P()
    shape = getattr(leaf, "shape", ())
    if "BatchNorm" in path_str or "bn" in path_str:
        return P()
    if len(shape) == 5 and shape[-1] % tp == 0:  # conv kernel
        return P(None, None, None, None, "model")
    if len(shape) == 2 and shape[-1] % tp == 0:  # dense kernel
        return P(None, "model")
    if len(shape) == 1 and shape[0] % tp == 0:  # bias
        return P("model")
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param tree with tensor-parallel channel sharding."""
    tp = mesh.shape["model"]

    def place(path, leaf):
        path_str = "/".join(str(p) for p in path)
        spec = _param_spec(path_str, leaf, tp)
        return _place(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_state(state, mesh: Mesh):
    """Place a GANTrainState on the mesh: G params TP-sharded, D params and
    everything else replicated (opt state mirrors its params)."""
    rep = replicate(mesh)

    def rep_put(tree):
        return jax.tree.map(lambda x: _place(x, rep), tree)

    params_G = shard_params(state.params_G, mesh)
    # Adam moments are kept replicated (2×34M f32 ≈ 272 MB — cheap on HBM);
    # GSPMD reshards them against the TP-sharded params inside the step.
    opt_G = jax.tree.map(
        lambda leaf: _place(leaf, rep), state.opt_state_G
    )
    return state.replace(
        params_G=params_G,
        params_D=rep_put(state.params_D),
        batch_stats_D=rep_put(state.batch_stats_D),
        params_D_frozen=rep_put(state.params_D_frozen),
        opt_state_G=opt_G,
        opt_state_D=rep_put(state.opt_state_D),
        it=_place(state.it, rep),
        rng=_place(state.rng, rep),
    )


def pad_batch_to(batch: np.ndarray, multiple: int):
    """Pad the batch axis up to a multiple of the data-axis size."""
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = np.repeat(batch[:1], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), n
