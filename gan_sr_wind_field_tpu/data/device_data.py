"""Device-resident training data: upload full volumes once, slice batches
on device.

The host path (`WindDataset.batches` + `pipeline.prefetch_to_device`)
moves every batch host→device — ~22 MB/iteration at the cluster geometry.
On a directly-attached TPU that transfer hides behind compute; over a
remote-tunnel runtime it is the bottleneck (measured: 2.5 s/it against a
0.28 s/it compute step — the tunnel sustains ~10 MB/s H2D). TPU-first
fix: the whole training split fits HBM with room to spare (~630 MB at
192 × 128×128×10 synthetic volumes, vs ≥2 GB headroom at batch 32), so
upload it ONCE and make batches with a tiny jitted gather+slice program —
zero steady-state host→device traffic.

Semantics vs the host path (reference process_data.py:159-176 via
data/dataset.py:157-192):

- identical per-sample math: patches are Beta(0.25, 0.25) corner-biased
  HR-grid offsets; LR is the pure-strided decimation OF THE PATCH (all
  LR channels are pointwise normalizations, so normalize-then-decimate
  commutes and one full-grid ``reformat_sample(coarseness_factor=1)``
  per sample carries every channel);
- sampling is with-replacement uniform over the split (jitted
  ``randint``) instead of epoch-wise permutation — same marginal
  distribution, different stream; the host path (and its epoch
  bookkeeping) remains the default and the CPU golden-trajectory tests
  pin it. Enable with the ``device_resident_data`` config flag.

Augmentation stays inside the train step (on-device, as for the host
path); test/val loops keep the host path (they run once per val_period).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def slice_batch(full, zraw, key, *, batch_size: int, patch: int,
                patch_y: int, cf: int, enable_slicing: bool):
    """Pure jittable batch maker over the resident volumes.

    full: (N, X, Y, ZL, C) — all LR channels at the full HR grid
    (``reformat_sample(coarseness_factor=1)`` per volume); zraw:
    (N, X, Y, ZL, 1) raw heights. Returns (LR, HR, Z) exactly as the
    host path produces them for the same patch (LR is the pure-strided
    decimation OF THE PATCH; reference process_data.py:159-176,451-457).
    Shared by `DeviceBatcher` (one dispatch per batch) and the chunked
    trainer (`WindFieldGAN.train_chunk`, in-graph batches).
    """
    N, X, Y, ZL, C = full.shape
    P, Py = patch, patch_y
    kidx, kx, ky = jax.random.split(key, 3)
    idx = jax.random.randint(kidx, (batch_size,), 0, N)
    if enable_slicing:
        bx = jax.random.beta(kx, 0.25, 0.25, (batch_size,))
        by = jax.random.beta(ky, 0.25, 0.25, (batch_size,))
        xs = jnp.round(bx * (X - P)).astype(jnp.int32)
        ys = jnp.round(by * (Y - Py)).astype(jnp.int32)
    else:
        xs = ys = jnp.zeros((batch_size,), jnp.int32)

    def one(i, x0, y0):
        p = jax.lax.dynamic_slice(
            full, (i, x0, y0, 0, 0), (1, P, Py, ZL, C)
        )[0]
        zp = jax.lax.dynamic_slice(
            zraw, (i, x0, y0, 0, 0), (1, P, Py, ZL, 1)
        )[0]
        return p, zp

    patch_b, zp = jax.vmap(one)(idx, xs, ys)
    hr = patch_b[..., :3]
    lr = patch_b[:, ::cf, ::cf]
    return lr, hr, zp


def load_resident_volumes(dataset):
    """Materialize the split's full volumes for `slice_batch` (host side).

    → (full (N,X,Y,ZL,C) f32, zraw (N,X,Y,ZL,1) f32) numpy arrays."""
    from gan_sr_wind_field_tpu.data.transform import reformat_sample

    full, zraw = [], []
    for name in dataset.filenames:
        z, zag, u, v, w, p = dataset._load(name)
        if dataset.interpolate_z:
            z, zag, u, v, w, p = dataset._interp_cached(
                name, z, zag, u, v, w, p
            )
        # cf=1: LR == all channels at the full HR grid (u,v,w then the
        # extra LR channels); channel-wise normalize/decimate commute
        lr1, _, zt = reformat_sample(
            np.asarray(z), np.asarray(zag), np.asarray(u),
            np.asarray(v), np.asarray(w), np.asarray(p),
            dataset.stats, coarseness_factor=1,
            include_pressure=dataset.include_pressure,
            include_z_channel=dataset.include_z_channel,
            include_above_ground_channel=(
                dataset.include_above_ground_channel
            ),
        )
        full.append(lr1)
        zraw.append(zt)
    return np.stack(full), np.stack(zraw)


class DeviceBatcher:
    """Infinite iterator of device-resident (LR, HR, Z) training batches.

    Parameters
    ----------
    dataset : WindDataset
        Source of full volumes (its slicing/aug settings are NOT used —
        patches are cut on device; augmentation belongs to the step).
    batch_size : int
        Global batch size.
    seed : int
        Base of the offset/index RNG stream (folded with a batch counter).
    sharding : optional jax.sharding.NamedSharding
        Sharding for the produced batches (dp/sp meshes). The resident
        volumes are replicated across the mesh.
    start_count : int
        Initial value of the batch counter the key is folded with. Pass
        the resumed iteration so a resumed leg CONTINUES the batch/offset
        stream instead of replaying the previous leg's (the seed itself is
        re-derived identically from fixed_seed on every process start).
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 sharding: Optional[jax.sharding.Sharding] = None,
                 start_count: int = 0):
        import functools

        self.batch_size = int(batch_size)
        self.slice_size = int(dataset.slice_size)
        self.enable_slicing = bool(dataset.enable_slicing)
        self.cf = int(dataset.coarseness_factor)

        full, zraw = load_resident_volumes(dataset)

        replicate = None
        if sharding is not None:
            replicate = jax.sharding.NamedSharding(
                sharding.mesh, jax.sharding.PartitionSpec()
            )
        self._full = jax.device_put(full, replicate)
        self._zraw = jax.device_put(zraw, replicate)
        self._key = jax.random.key(seed)
        self._count = int(start_count)

        N, X, Y, ZL, C = full.shape
        make = functools.partial(
            slice_batch,
            batch_size=self.batch_size,
            patch=self.slice_size if self.enable_slicing else X,
            patch_y=self.slice_size if self.enable_slicing else Y,
            cf=self.cf,
            enable_slicing=self.enable_slicing,
        )
        self._make = jax.jit(
            make,
            out_shardings=(None if sharding is None
                           else (sharding, sharding, sharding)),
        )

    def resident_bytes(self) -> int:
        return self._full.nbytes + self._zraw.nbytes

    def __iter__(self):
        while True:
            key = jax.random.fold_in(self._key, self._count)
            self._count += 1
            yield self._make(self._full, self._zraw, key)
