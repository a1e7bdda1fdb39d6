"""Equivariant data augmentation for 3D wind vector fields.

The wind field is a *vector* field: a spatial rot90/flip must also transform
the (u, v) components or the physics (e.g. divergence-freeness) breaks —
which is exactly why the reference permutes/negates components
(process_data.py:198-262). Property-tested in
tests/test_physics_equivariance.py.

Semantics (channel-last (X, Y, Z, C); components u=ch0, v=ch1):

- rot90 by k in the (x, y) plane: spatial ``rot90(axes=(0,1))`` then
  (u,v) → k=1: (-v, u); k=2: (-u, -v); k=3: (v, -u).
- flip along x (axis 0): spatial flip + u → -u;  along y: v → -v.
- the geopotential-height field Z and any scalar LR channels (pressure,
  z-channels) transform spatially only.

Two implementations with identical semantics:

- numpy per-sample (host dataset path, explicit ``np.random.Generator``),
- jittable JAX batched (`augment_batch`) used *inside* the train step — the
  augmentation runs fused on-device with per-sample traced draws, replacing
  the reference's per-worker numpy RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# --------------------------------------------------------------------------
# numpy (host) versions
# --------------------------------------------------------------------------


def rot90_vector_field_np(a: np.ndarray, k: int, rotate_uv: bool = True):
    """Rotate (X,Y,Z,C) by k·90° in the xy-plane with (u,v) rotation."""
    k = k % 4
    out = np.rot90(a, k, axes=(0, 1)).copy()
    if rotate_uv and k and a.shape[-1] >= 2:
        u = out[..., 0].copy()
        v = out[..., 1].copy()
        if k == 1:
            out[..., 0], out[..., 1] = -v, u
        elif k == 2:
            out[..., 0], out[..., 1] = -u, -v
        else:
            out[..., 0], out[..., 1] = v, -u
    return out


def flip_vector_field_np(a: np.ndarray, axis: int, negate: bool = True):
    """Mirror along spatial ``axis`` (0=x, 1=y), negating that component."""
    out = np.flip(a, axis=axis).copy()
    if negate and a.shape[-1] > axis:
        out[..., axis] = -out[..., axis]
    return out


def augment_sample_np(lr, hr, z, rng: np.random.Generator,
                      rot: bool = True, flip: bool = True):
    """Host-side augmentation of one (LR, HR, Z) triple.

    Draw order mirrors the reference's __getitem__ (rot int, then two
    uniform flips — process_data.py:198-262) so a fixed seed reproduces.
    """
    if rot:
        k = int(rng.integers(0, 4))
        lr = rot90_vector_field_np(lr, k)
        hr = rot90_vector_field_np(hr, k)
        z = np.rot90(z, k, axes=(0, 1)).copy()
    if flip:
        if rng.random() > 0.5:
            lr = flip_vector_field_np(lr, 0)
            hr = flip_vector_field_np(hr, 0)
            z = np.flip(z, axis=0).copy()
        if rng.random() > 0.5:
            lr = flip_vector_field_np(lr, 1)
            hr = flip_vector_field_np(hr, 1)
            z = np.flip(z, axis=1).copy()
    return lr, hr, z


# --------------------------------------------------------------------------
# JAX (device, jittable) versions
# --------------------------------------------------------------------------


def _mix_uv(x, k: int):
    u = x[..., 0]
    v = x[..., 1]
    if k == 1:
        return x.at[..., 0].set(-v).at[..., 1].set(u)
    if k == 2:
        return x.at[..., 0].set(-u).at[..., 1].set(-v)
    return x.at[..., 0].set(v).at[..., 1].set(-u)  # k == 3


def _rot90_single(x, k, rotate_uv: bool):
    """Rotate one (X,Y,Z,C) sample by a *traced* k∈{0..3} (square X=Y)."""

    def branch(kk: int):
        def f(xx):
            r = jnp.rot90(xx, kk, axes=(0, 1))
            if rotate_uv and kk and xx.shape[-1] >= 2:
                r = _mix_uv(r, kk)
            return r

        return f

    return lax.switch(k, [branch(kk) for kk in range(4)], x)


def _flip_single(x, fx, fy, negate: bool):
    """Conditionally mirror one sample along x and/or y (traced bools)."""
    xf = jnp.flip(x, axis=0)
    if negate and x.shape[-1] > 0:
        xf = xf.at[..., 0].multiply(-1.0)
    x = jnp.where(fx, xf, x)
    yf = jnp.flip(x, axis=1)
    if negate and x.shape[-1] > 1:
        yf = yf.at[..., 1].multiply(-1.0)
    return jnp.where(fy, yf, x)


def augment_batch(key, lr, hr, z):
    """Batched on-device augmentation: independent rot90 + flips per sample.

    lr (N,x,y,zl,C), hr (N,X,Y,zl,3), z (N,X,Y,zl,1) — all three get the
    same spatial transform per sample; lr/hr get the component mixing.
    """
    n = lr.shape[0]
    k_rot, k_fx, k_fy = jax.random.split(key, 3)
    ks = jax.random.randint(k_rot, (n,), 0, 4)
    fx = jax.random.bernoulli(k_fx, 0.5, (n,))
    fy = jax.random.bernoulli(k_fy, 0.5, (n,))

    def one(lr_i, hr_i, z_i, k, fxi, fyi):
        lr_i = _flip_single(_rot90_single(lr_i, k, True), fxi, fyi, True)
        hr_i = _flip_single(_rot90_single(hr_i, k, True), fxi, fyi, True)
        z_i = _flip_single(_rot90_single(z_i, k, False), fxi, fyi, False)
        return lr_i, hr_i, z_i

    return jax.vmap(one)(lr, hr, z, ks, fx, fy)
