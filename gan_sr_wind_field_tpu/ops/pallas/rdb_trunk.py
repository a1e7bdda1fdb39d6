"""Pallas TPU kernel: the ENTIRE RRDB trunk as one fused kernel.

The generator trunk (16 RRDB × 3 RDB × (4 growth convs + LFF), reference
CNN_models/torch_blocks.py:217-330, Generator_3D_Resnet_ESRGAN.py:183-199)
is the dominant cost of a G forward. Two structural problems cap the
pure-XLA lowering on TPU:

1. **MXU lane waste** — every dense-growth conv has only ``gc=32`` output
   channels, so XLA's conv tiling fills 32 of the 128 MXU lanes (~25% MXU,
   measured on v5e). Here each 3×3×3 conv is re-expressed as
   ``ceil(27/4)`` matmuls of shape (R, Cin)@(Cin, 4·gc): FOUR kernel taps
   are stacked along the output-lane axis (their weights side by side), the
   MXU runs at full width, and each tap's partial result is scattered to its
   spatial offset with a static row-roll + boundary mask on the VPU.
2. **HBM round-trips** — XLA materialises every concat/LFF/residual through
   HBM. Here the trunk state (R, nf), the dense growth buffer (R, 4·gc) and
   the RRDB residual live in VMEM scratch that PERSISTS across grid steps
   (grid = (batch, n_rdb), sequential on a TensorCore); only the per-RDB
   weights stream from HBM, double-buffered by the pallas pipeline.

Layout: activations are kept 2-D as (R, C) with R = X·Y·Zl rows (z fastest)
and channels on the 128-lane axis — no lane↔sublane reshapes in-kernel
(Mosaic layout rule, see ops/pallas/stencil.py). A kernel tap (dx,dy,dz) is
then a row shift by ``dx·Y·Zl + dy·Zl + dz``; rows whose source crosses an
x/y/z boundary are zeroed by precomputed masks (one 32-lane-wide column
block per tap, so mask application is a single aligned multiply).

Numerics follow the XLA path: matmuls accumulate f32, LeakyReLU and the
×0.2 residual adds are applied in the compute dtype (bf16 in training
configs). Forward-only — used where no gradient flows through G (the D
train branch, validation SR, serving); the G update keeps the XLA trunk
whose VJP is free.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = 27  # 3×3×3 kernel


def _tap_geometry(gc: int):
    """(taps_per_group, n_groups, n_slots) for output-lane tap batching."""
    tpg = max(1, 128 // gc)
    n_groups = -(-_TAPS // tpg)
    return tpg, n_groups, n_groups * tpg


def pack_trunk_params(params_G, num_rrdb: int, num_convs: int, nf: int,
                      gc: int, dtype):
    """Repack the flax trunk params into kernel-ready stacked tensors.

    Per RDB and growth conv k (kernel (3,3,3, nf+gc·k, gc)) the 27 taps are
    flattened (x-major, matching the (R, C) row flattening), split into the
    state part (first nf input channels) and the dense-growth part, padded
    to ``n_slots`` taps and laid out groups×(Cin, tpg·gc) so that group g,
    lane block u holds tap ``g·tpg+u``.

    Returns dict with:
      A  : (J, K, n_groups, nf, tpg·gc)        state-part weights
      B  : tuple over k=1..K-1 of (J, n_groups, gc·k, tpg·gc)
      Wl : (J, nf + gc·K, nf)                  LFF (1×1×1) weights
      bl : (J, 1, nf)                          LFF bias
    where J = 3·num_rrdb RDB steps and K = num_convs - 1 growth convs.
    """
    K = num_convs - 1
    tpg, n_groups, n_slots = _tap_geometry(gc)

    A_steps, B_steps, Wl_steps, bl_steps = [], [], [], []
    for i in range(num_rrdb):
        rrdb = params_G[f"RRDB{i}"]
        for j in range(3):
            p = rrdb[f"RDB{j}"]
            A_k, B_k = [], []
            for k in range(K):
                cin = nf + gc * k
                w = p[f"conv{k}"]["Conv_0"]["kernel"].astype(dtype)
                wt = w.reshape(_TAPS, cin, gc)
                wt = jnp.pad(wt, ((0, n_slots - _TAPS), (0, 0), (0, 0)))
                # (slots, cin, gc) → (groups, cin, tpg·gc)
                wt = wt.reshape(n_groups, tpg, cin, gc)
                wt = wt.transpose(0, 2, 1, 3).reshape(n_groups, cin, tpg * gc)
                A_k.append(wt[:, :nf])
                if k > 0:
                    B_k.append(wt[:, nf:])
            A_steps.append(jnp.stack(A_k))
            B_steps.append(B_k)
            lff = p["LFF"]["kernel"].astype(dtype)
            Wl_steps.append(lff.reshape(nf + gc * K, nf))
            bl_steps.append(p["LFF"]["bias"].astype(dtype).reshape(1, nf))

    packed = {
        "A": jnp.stack(A_steps),
        "B": tuple(
            jnp.stack([b[k] for b in B_steps]) for k in range(K - 1)
        ),
        "Wl": jnp.stack(Wl_steps),
        "bl": jnp.stack(bl_steps),
    }
    return packed


@functools.lru_cache(maxsize=16)
def _build_masks_np(X: int, Y: int, Z: int, gc: int):
    """(R, 27·gc) boundary masks: column block t is tap t's validity,
    pre-broadcast to gc lanes so mask application is one aligned multiply."""
    r = np.arange(X * Y * Z)
    xs, ys, zs = r // (Y * Z), (r // Z) % Y, r % Z
    cols = []
    for t in range(_TAPS):
        dx, dy, dz = t // 9 - 1, (t // 3) % 3 - 1, t % 3 - 1
        ok = (
            (xs + dx >= 0) & (xs + dx < X)
            & (ys + dy >= 0) & (ys + dy < Y)
            & (zs + dz >= 0) & (zs + dz < Z)
        )
        cols.append(np.repeat(ok[:, None], gc, axis=1))
    return np.concatenate(cols, axis=1).astype(np.float32)


def _roll_rows(v, off: int):
    """rolled[r] = v[(r + off) mod R] — static row shift (two slices)."""
    n = v.shape[0]
    off = off % n
    if off == 0:
        return v
    return jnp.concatenate([v[off:], v[:off]], axis=0)


def _trunk_kernel(R, nf, gc, K, J, tpg, n_groups, offs, rdb_scale,
                  rrdb_scale, per, dtype, slope,
                  masks_ref, x_ref, A_ref, *rest):
    B_refs = rest[: K - 1]
    Wl_ref, bl_ref, out_ref, state, growth, rres = rest[K - 1:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _load():
        state[...] = x_ref[0]

    @pl.when(j % per == 0)
    def _save_rrdb_in():
        rres[...] = state[...]

    s = state[...]  # (R, nf) compute dtype
    for k in range(K):
        y = jnp.zeros((R, gc), jnp.float32)
        for g in range(n_groups):
            p_grp = jnp.dot(
                s, A_ref[0, k, g], preferred_element_type=jnp.float32
            )
            if k > 0:
                p_grp = p_grp + jnp.dot(
                    growth[:, : gc * k],
                    B_refs[k - 1][0, g],
                    preferred_element_type=jnp.float32,
                )
            for u in range(tpg):
                t = g * tpg + u
                if t >= _TAPS:
                    break
                chunk = _roll_rows(p_grp[:, u * gc:(u + 1) * gc], offs[t])
                y = y + chunk * masks_ref[:, t * gc:(t + 1) * gc]
        # LeakyReLU: compare/select in f32 (Mosaic has no bf16 cmpf on v5e),
        # then round to the compute dtype — sign is rounding-invariant so
        # this matches XLA's lrelu(bf16) to bf16 ULP
        yb = jnp.where(y >= 0, y, y * slope).astype(dtype)
        growth[:, k * gc:(k + 1) * gc] = yb

    lff = jnp.dot(s, Wl_ref[0, :nf], preferred_element_type=jnp.float32)
    lff = lff + jnp.dot(
        growth[...], Wl_ref[0, nf:], preferred_element_type=jnp.float32
    )
    lff = lff + bl_ref[0].astype(jnp.float32)
    new = s + lff.astype(dtype) * jnp.asarray(rdb_scale, dtype)
    is_rrdb_end = (j % per) == (per - 1)
    new = jnp.where(
        is_rrdb_end, rres[...] + new * jnp.asarray(rrdb_scale, dtype), new
    )
    state[...] = new

    @pl.when(j == J - 1)
    def _flush():
        out_ref[0] = state[...]


def fused_rrdb_trunk(packed, x, *, gc: int, num_convs: int,
                     rdb_scale: float = 0.2, rrdb_scale: float = 0.2,
                     rdbs_per_rrdb: int = 3, negative_slope: float = 0.2,
                     interpret: bool = False):
    """Run the whole RRDB trunk in one pallas call.

    packed: from :func:`pack_trunk_params`; x: (N, X, Y, Zl, nf) in the
    compute dtype. Returns the trunk output (N, X, Y, Zl, nf), same dtype
    (i.e. the value fed to lr_conv in the XLA path).
    """
    N, X, Y, Zl, nf = x.shape
    R = X * Y * Zl
    K = num_convs - 1
    J = packed["A"].shape[0]
    tpg, n_groups, _ = _tap_geometry(gc)
    dtype = x.dtype

    offs = tuple(
        (t // 9 - 1) * (Y * Zl) + ((t // 3) % 3 - 1) * Zl + (t % 3 - 1)
        for t in range(_TAPS)
    )
    masks = jnp.asarray(_build_masks_np(X, Y, Zl, gc), dtype)

    x2 = x.reshape(N, R, nf)
    kernel = functools.partial(
        _trunk_kernel, R, nf, gc, K, J, tpg, n_groups, offs,
        rdb_scale, rrdb_scale, rdbs_per_rrdb, dtype, negative_slope,
    )
    gcT = gc * K
    in_specs = [
        pl.BlockSpec(masks.shape, lambda b, j: (0, 0)),
        pl.BlockSpec((1, R, nf), lambda b, j: (b, 0, 0)),
        pl.BlockSpec(
            (1,) + packed["A"].shape[1:], lambda b, j: (j, 0, 0, 0, 0)
        ),
        *[
            pl.BlockSpec((1,) + bk.shape[1:], lambda b, j: (j, 0, 0, 0))
            for bk in packed["B"]
        ],
        pl.BlockSpec((1, nf + gcT, nf), lambda b, j: (j, 0, 0)),
        pl.BlockSpec((1, 1, nf), lambda b, j: (j, 0, 0)),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(N, J),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, nf), lambda b, j: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, R, nf), dtype),
        scratch_shapes=[
            pltpu.VMEM((R, nf), dtype),
            pltpu.VMEM((R, gcT), dtype),
            pltpu.VMEM((R, nf), dtype),
        ],
        # the persistent activations + masks + f32 tap temps exceed the 16 MB
        # default scoped-vmem budget; v5e/v4 have 128 MiB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(masks, x2, packed["A"], *packed["B"], packed["Wl"], packed["bl"])
    return out.reshape(N, X, Y, Zl, nf)


def trunk_fusable(num_convs: int, gc: int, lff_kern_size: int,
                  conv_mode: str, lr_spatial: Sequence[int],
                  max_rows: int = 4096) -> bool:
    """Whether the fused trunk supports this generator geometry.

    Row cap keeps all persistent VMEM buffers + masks within ~14 MB; larger
    volumes fall back to the XLA trunk (serving tiles big fields anyway).
    """
    rows = int(np.prod(lr_spatial))
    return (
        conv_mode == "3D"
        and lff_kern_size == 1
        and num_convs >= 2
        and gc <= 128
        and rows <= max_rows
        and rows % 8 == 0
    )
