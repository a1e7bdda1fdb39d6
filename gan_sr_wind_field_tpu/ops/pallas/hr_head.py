"""Pallas TPU kernel: the generator's HR head conv (hr_conv0) at full
MXU lane utilisation.

hr_conv0 (reference Generator_3D_Resnet_ESRGAN.py:183-222) is a k=5³ conv
144→144 at HR resolution — the single largest op outside the trunk
(~55 ms of the ~490 ms G step at the bench geometry). XLA's lowering pads
the 144 output channels to 2 lane tiles (256) so every MXU pass runs at
56% lane utilisation; an XLA-level tap-stacked reformulation (ops/
tap_conv.py) is no help here because the 25× partial tensor would round-
trip HBM (measured bandwidth-bound at 144 channels).

Kernel design — tile-exact channel split + 8-tap lane packing:

- The conv is split across OUTPUT channels into a 128-channel main slice
  (this kernel) and a 16-channel remainder (XLA tap-stacking, fine at that
  width). The two halves stay separate arrays downstream — Dropout3d is
  per-channel and hr_conv1 is linear in input channels, so nothing ever
  needs the concat.
- Main slice: the k z-taps fold into the matmul K dimension via a VMEM
  z-im2col of the input chunk (k row-rolls + boundary masks); the k² xy
  taps are stacked along the output lanes in groups of 8 → N = 8·128 =
  1024 lanes, i.e. EXACT tile packing with zero padding (vs 56% for the
  direct form). 25 taps = 3×8 + 1 groups.
- Scatter-style accumulation with a rolling VMEM accumulator: the grid
  walks x-plane chunks (grid = (batch, X/CX + 1), sequential on one
  TensorCore); each chunk's partial-product matmul covers EXACTLY its own
  rows (no halo recompute at any chunk size) and its taps scatter into a
  persistent (CX+2hp)-plane f32 accumulator; each step flushes the CX
  completed planes (fused LeakyReLU + channel-dropout mask) and shifts
  the accumulator window. The x-plane overflow of the scatter lands
  exactly in the accumulator's halo planes; y overflow is masked; the
  terrain branch rides the same matmuls via a precomputed XLA z-im2col
  (16 channels — not worth in-kernel rolls).

Numerics: one f32 accumulation over all taps and both branches, LeakyReLU
in f32, single rounding to the compute dtype — the same accumulate-once
shape as XLA's concat conv (parity-tested; training-transparency measured
like ops/tap_conv.py).

MEASURED VERDICT (v5e, batch 32, 64×64×10, bf16) — kept available but OFF
by default: standalone the kernel wins clearly (conv0 stage 67.6 → 49.3
ms), but *in-graph* XLA schedules hr_conv0 far better than its standalone
layout (and better than the 56%-lane-padding analysis predicts — the same
conclusion the round-1 per-tap prototype reached), so the integrated
numbers regress: eval G forward 130.4 → 138.4 ms, blended bench 3.99 →
3.77 Mvox/s (the custom-VJP boundary also costs the G update the fused
lrelu-mask recompute and a dPre concat). Flip `use_pallas_head` on only
for geometries where the in-graph gap reverses.

The custom-VJP wrapper (`hr_head`) pairs the kernel forward with XLA's
own transposed convs via `jax.linear_transpose` (convolution is linear in
each argument), so gradients are bit-comparable to autodiff of the plain
head at unchanged backward cost.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gan_sr_wind_field_tpu.ops.pallas.rdb_trunk import _roll_rows
from gan_sr_wind_field_tpu.ops.tap_conv import tap_stacked_conv3d

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _round8(n: int) -> int:
    return -(-n // 8) * 8


@functools.lru_cache(maxsize=16)
def _z_masks_np(rows: int, Z: int, k: int, width: int):
    """(rows, (k-1)·width) validity masks for the z row-rolls.

    Block order: shifts s = -hp..-1 then +1..+hp; valid(r, s) ⇔
    0 ≤ (r mod Z) + s < Z."""
    hp = (k - 1) // 2
    z = np.arange(rows) % Z
    cols = []
    for s in list(range(-hp, 0)) + list(range(1, hp + 1)):
        ok = (z + s >= 0) & (z + s < Z)
        cols.append(np.repeat(ok[:, None], width, axis=1))
    return np.concatenate(cols, axis=1).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _y_masks_np(rows: int, Y: int, Z: int, k: int, width: int):
    """(rows, k·width) per-dy validity masks on accumulator rows:
    valid(a, dy) ⇔ 0 ≤ y(a) + dy − hp < Y."""
    hp = (k - 1) // 2
    y = (np.arange(rows) // Z) % Y
    cols = []
    for dy in range(k):
        ok = (y + dy - hp >= 0) & (y + dy - hp < Y)
        cols.append(np.repeat(ok[:, None], width, axis=1))
    return np.concatenate(cols, axis=1).astype(np.float32)


def pack_head_weights(Wx, Wt, cm: int, dtype):
    """(k,k,k,ci,C) weights → matmul operands for the main slice.

    Ax: (k·nf, k²·cm) with rows (dz, ci) and cols (tap v=(dx,dy), co);
    At: (k·tc, k²·cm) likewise for the terrain branch."""
    k = Wx.shape[0]

    def repack(W):
        cin = W.shape[3]
        # (dx,dy,dz,ci,co≤cm) → (dz,ci, dx,dy,co)
        wt = jnp.transpose(W[..., :cm], (2, 3, 0, 1, 4))
        return wt.reshape(k * cin, k * k * cm).astype(dtype)

    return repack(Wx), repack(Wt)


def _head_kernel(Rc, acc_rows, nf, tc, k, hp, CM, T, G8, n_groups, YZ, Z,
                 GT, nchunk, slope, out_dtype,
                 mz_ref, my_ref, x_ref, t5_ref, Ax_ref, At_ref, dm_ref,
                 out_ref, S, P, acc):
    b, j = pl.program_id(0), pl.program_id(1)

    @pl.when((b == 0) & (j == 0))
    def _zero_p_guards():
        # extraction slices touching the guards are y-invalid rows killed
        # by the mask — but garbage×0 would still propagate NaN, so zero
        P[0:GT] = jnp.zeros((GT, P.shape[1]), jnp.float32)
        P[GT + Rc:] = jnp.zeros((P.shape[0] - GT - Rc, P.shape[1]),
                                jnp.float32)

    @pl.when(j == 0)
    def _zero_acc():
        acc[...] = jnp.zeros_like(acc)

    @pl.when(j < nchunk)
    def _compute():
        slab = x_ref[0]  # (Rc, nf)
        # z-im2col of the x branch: k row-rolls, boundary rows zeroed
        for dz in range(k):
            s = dz - hp
            blk = _roll_rows(slab, s)
            if s != 0:
                mi = (s + hp) if s < 0 else (hp + s - 1)
                blk = blk * mz_ref[:, mi * nf:(mi + 1) * nf]
            S[:, dz * nf:(dz + 1) * nf] = blk
        t5 = t5_ref[0]  # (Rc, k·tc) — z-im2col precomputed in XLA
        accv = acc[...]
        for g in range(n_groups):
            v0 = g * G8
            v1 = min(T, v0 + G8)
            W = (v1 - v0) * CM
            pg = jnp.dot(S[...], Ax_ref[:, v0 * CM: v0 * CM + W],
                         preferred_element_type=jnp.float32)
            pg = pg + jnp.dot(t5, At_ref[:, v0 * CM: v0 * CM + W],
                              preferred_element_type=jnp.float32)
            P[GT:GT + Rc, :W] = pg
            for i, v in enumerate(range(v0, v1)):
                dx, dy = v // k, v % k
                # acc row α reads P[GT + α + (dx−2hp)·YZ + (dy−hp)·Z]:
                # source row = out row + (dx−hp)·YZ + (dy−hp)·Z, shifted by
                # the chunk-origin offset between acc (plane j·CX−hp) and
                # P (plane j·CX)
                start = GT + (dx - 2 * hp) * YZ + (dy - hp) * Z
                chunk = P[start:start + acc_rows, i * CM:(i + 1) * CM]
                if dy != hp:  # y taps can cross plane columns — mask
                    chunk = chunk * my_ref[:, dy * CM:(dy + 1) * CM]
                accv = accv + chunk
        acc[...] = accv

    # flush the CX completed planes: fused LeakyReLU + channel dropout
    h = acc[0:Rc]
    h = jnp.where(h >= 0, h, h * slope)
    h = h * dm_ref[0]
    out_ref[0] = h.astype(out_dtype)
    sh = 2 * hp * YZ
    acc[0:sh] = acc[Rc:Rc + sh]
    acc[sh:] = jnp.zeros((acc_rows - sh, acc.shape[1]), jnp.float32)


def hr_head_main(x2, t5, Ax, At, dmask, *, X, Y, Z, k, CM, CX,
                 negative_slope, interpret=False):
    """Main-slice conv + LeakyReLU + channel-mask as one pallas call.

    x2: (N, X·Y·Z, nf); t5: (N, X·Y·Z, k·tc); Ax/At from
    :func:`pack_head_weights`; dmask: (N, 1, CM) channel dropout scale
    (ones for eval). Returns (N, X·Y·Z, CM) in x2's dtype."""
    N, R, nf = x2.shape
    tc = t5.shape[-1] // k
    hp = (k - 1) // 2
    YZ = Y * Z
    Rc = CX * YZ
    acc_rows = (CX + 2 * hp) * YZ
    nchunk = X // CX
    T = k * k
    # 4-tap groups: N = 4·128 = 512 lanes — still exact tile packing, and
    # the f32 partial buffer halves vs 8-tap groups (VMEM budget)
    G8 = max(1, 512 // CM)
    n_groups = -(-T // G8)
    Pw = min(T, G8) * CM
    GT = _round8(2 * hp * YZ + hp * Z)
    p_rows = _round8(GT + hp * Z + acc_rows)
    dtype = x2.dtype

    m_z = jnp.asarray(_z_masks_np(Rc, Z, k, nf), dtype)
    m_y = jnp.asarray(_y_masks_np(acc_rows, Y, Z, k, CM), dtype)

    kernel = functools.partial(
        _head_kernel, Rc, acc_rows, nf, tc, k, hp, CM, T, G8, n_groups,
        YZ, Z, GT, nchunk, negative_slope, dtype,
    )
    last = nchunk - 1
    out = pl.pallas_call(
        kernel,
        grid=(N, nchunk + 1),
        in_specs=[
            pl.BlockSpec(m_z.shape, lambda b, j: (0, 0)),
            pl.BlockSpec(m_y.shape, lambda b, j: (0, 0)),
            pl.BlockSpec((1, Rc, nf),
                         lambda b, j: (b, jnp.minimum(j, last), 0)),
            pl.BlockSpec((1, Rc, k * tc),
                         lambda b, j: (b, jnp.minimum(j, last), 0)),
            pl.BlockSpec(Ax.shape, lambda b, j: (0, 0)),
            pl.BlockSpec(At.shape, lambda b, j: (0, 0)),
            pl.BlockSpec((1, 1, CM), lambda b, j: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Rc, CM), lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((N, (nchunk + 1) * Rc, CM), dtype),
        scratch_shapes=[
            pltpu.VMEM((Rc, k * nf), dtype),       # x z-im2col
            pltpu.VMEM((p_rows, Pw), jnp.float32),  # tap partials + guards
            pltpu.VMEM((acc_rows, CM), jnp.float32),  # rolling accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(m_z, m_y, x2, t5, Ax, At, dmask)
    # flush j covers real planes [j·CX − hp, (j+1)·CX − hp)
    return out[:, hp * YZ: hp * YZ + R, :]


def _z_im2col(t, k: int):
    """(N,X,Y,Z,tc) → (N, X·Y·Z, k·tc) zero-padded z-shift stack."""
    N, X, Y, Z, tc = t.shape
    hp = (k - 1) // 2
    tp = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (hp, hp), (0, 0)))
    cols = [tp[:, :, :, dz: dz + Z, :] for dz in range(k)]
    return jnp.concatenate(cols, axis=-1).reshape(N, X * Y * Z, k * tc)


def pick_chunk(X: int, k: int, YZ: int) -> Optional[int]:
    """x-plane chunk size: a divisor of X, ≥ the 2·hp accumulator shift,
    targeting ~5k rows per chunk. None if the geometry can't be chunked.
    WINDSR_HEAD_CX overrides (perf tuning)."""
    hp = (k - 1) // 2
    cands = [c for c in range(max(1, 2 * hp), X + 1) if X % c == 0]
    if not cands:
        return None
    env = os.environ.get("WINDSR_HEAD_CX")
    try:
        if env and int(env) in cands:
            return int(env)
    except ValueError:  # malformed override: ignore like out-of-range ones
        pass
    return min(cands, key=lambda c: abs(c * YZ - 5120))


def head_fusable(x_shape, k: int, C: int, cm: int = 128) -> bool:
    """Gate for the real (non-interpret) kernel path: exact main-slice
    tiling and a chunkable geometry."""
    N, X, Y, Z, nf = x_shape
    return (
        C >= cm
        and (Y * Z) % 8 == 0
        and nf % 128 == 0
        and pick_chunk(X, k, Y * Z) is not None
    )


class HeadMeta(NamedTuple):
    k: int
    negative_slope: float
    cm: int
    interpret: bool


def _head_forward(meta: HeadMeta, Wx, Wt, x, t, dmask):
    """h = dropmask ⊙ lrelu(conv(x;Wx) + conv(t;Wt)) as (main, remainder).

    dmask: (N, C) channel dropout scale or None (eval)."""
    k, slope = meta.k, meta.negative_slope
    N, X, Y, Z, nf = x.shape
    C = Wx.shape[-1]
    cm = min(meta.cm, C)
    cr = C - cm
    dtype = x.dtype
    hp = (k - 1) // 2

    CX = pick_chunk(X, k, Y * Z)
    x2 = x.reshape(N, -1, nf)
    t5 = _z_im2col(t.astype(dtype), k)
    Ax, At = pack_head_weights(Wx, Wt, cm, dtype)
    dm = (jnp.ones((N, 1, cm), dtype) if dmask is None
          else dmask[:, None, :cm].astype(dtype))
    h_main = hr_head_main(
        x2, t5, Ax, At, dm, X=X, Y=Y, Z=Z, k=k, CM=cm, CX=CX,
        negative_slope=slope, interpret=meta.interpret,
    ).reshape(N, X, Y, Z, cm)

    if cr == 0:
        return h_main, jnp.zeros((N, X, Y, Z, 0), dtype)
    pre = tap_stacked_conv3d(x, Wx[..., cm:].astype(dtype), hp)
    pre = pre + tap_stacked_conv3d(t.astype(dtype),
                                   Wt[..., cm:].astype(dtype), hp)
    h_rem = jax.nn.leaky_relu(pre, negative_slope=slope)
    if dmask is not None:
        h_rem = h_rem * dmask[:, None, None, None, cm:].astype(dtype)
    return h_main, h_rem.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def hr_head(meta: HeadMeta, Wx, Wt, x, t, dmask):
    """Differentiable fused HR-head conv0 stage → (h_main, h_rem).

    Requires ``negative_slope > 0``: the backward pass recovers
    sign(pre-activation) from the saved output h, which is ambiguous at
    h == 0 when the negative branch is flattened to zero (plain ReLU).
    """
    if meta.negative_slope <= 0.0:
        raise ValueError(
            "hr_head custom VJP needs negative_slope > 0 "
            "(sign recovery from the saved activation)"
        )
    return _head_forward(meta, Wx, Wt, x, t, dmask)


def _hr_head_fwd(meta, Wx, Wt, x, t, dmask):
    h_main, h_rem = _head_forward(meta, Wx, Wt, x, t, dmask)
    return (h_main, h_rem), (Wx, Wt, x, t, dmask, h_main, h_rem)


def _hr_head_bwd(meta, res, cts):
    Wx, Wt, x, t, dmask, h_main, h_rem = res
    dHm, dHr = cts
    k, slope = meta.k, meta.negative_slope
    hp = (k - 1) // 2
    cm = h_main.shape[-1]
    cdt = x.dtype

    # d(pre) = dH · dropmask · lrelu'(pre); sign(pre) is recoverable from
    # h wherever the mask is non-zero (mask ≥ 0), and dH·mask is already 0
    # where the channel was dropped
    def dpre(h, dH, lo):
        f = jnp.where(h >= 0, jnp.float32(1.0),
                      jnp.float32(slope)).astype(cdt)
        d = dH.astype(cdt) * f
        if dmask is not None:
            d = d * dmask[:, None, None, None, lo:lo + h.shape[-1]].astype(cdt)
        return d

    dP = dpre(h_main, dHm, 0)
    if h_rem.shape[-1]:
        dP = jnp.concatenate([dP, dpre(h_rem, dHr, cm)], axis=-1)

    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w, window_strides=(1, 1, 1), padding=[(hp, hp)] * 3,
            dimension_numbers=_DN,
        )

    # convolution is linear in each argument → transposes need no forward
    Wxc, Wtc = Wx.astype(cdt), Wt.astype(cdt)
    dX = jax.linear_transpose(lambda v: conv(v, Wxc), x)(dP)[0]
    dT = jax.linear_transpose(lambda v: conv(v, Wtc), t.astype(cdt))(dP)[0]
    dWx = jax.linear_transpose(lambda w: conv(x, w), Wxc)(dP)[0]
    dWt = jax.linear_transpose(
        lambda w: conv(t.astype(cdt), w), Wtc
    )(dP)[0]
    # the dropout mask is an rng-derived input — no gradient is ever
    # consumed through it
    d_dm = None if dmask is None else jnp.zeros_like(dmask)
    return (dWx.astype(Wx.dtype), dWt.astype(Wt.dtype),
            dX.astype(x.dtype), dT.astype(t.dtype), d_dm)


hr_head.defvjp(_hr_head_fwd, _hr_head_bwd)
