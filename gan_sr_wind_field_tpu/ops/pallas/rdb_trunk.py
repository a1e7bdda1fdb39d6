"""Pallas TPU kernel: the ENTIRE RRDB trunk as one fused kernel.

The generator trunk (16 RRDB × 3 RDB × (4 growth convs + LFF), reference
CNN_models/torch_blocks.py:217-330, Generator_3D_Resnet_ESRGAN.py:183-199)
is the dominant cost of a G forward. Two structural problems cap the
pure-XLA lowering on TPU:

1. **MXU lane waste** — every dense-growth conv has only ``gc=32`` output
   channels, so XLA's conv tiling fills 32 of the 128 MXU lanes (~25% MXU,
   measured on v5e).
2. **HBM round-trips** — XLA materialises every concat/LFF/residual through
   HBM.

Kernel design (v2, shaped by on-device ablations):

- Activations stay 2-D as (R, C), R = X·Y·Zl rows (z fastest), channels on
  the 128-lane axis — no lane↔sublane reshapes (Mosaic layout rule, see
  ops/pallas/stencil.py). Trunk state, the dense-growth buffer and the RRDB
  residual live in VMEM scratch that PERSISTS across grid steps
  (grid = (batch, n_rdb), sequential on a TensorCore); per-RDB weights
  stream from HBM, double-buffered by the pallas pipeline. Measured: this
  orchestration is fully overlapped (a no-compute kernel times at ~0 ms).
- Each 3×3×3 growth conv becomes matmuls + a 9-tap scatter. The z taps are
  folded into the matmul K dimension by keeping a 3-fold z-shifted im2col
  of the state (and of the growth features) resident in VMEM — built once
  per RDB with two full-width row-rolls + boundary masks, reused by all
  four convs. The remaining 3×3 (dx,dy) taps are stacked along the output
  lanes (slot v = (dx+1)·3+(dy+1), N = 12·gc after tile padding) so each
  conv is ONE wide matmul per input block, and each tap's partial sum is
  scattered by a circular row roll + per-tap x/y mask. x-boundary
  overflows coincide with the array ends (row = x·Y·Zl + y·Zl + z is
  x-major), so the roll + mask handles them exactly. Measured motivation:
  sub-tile 32-lane slice/accumulate chains cost ~0.8 µs each on v5e
  (lane-rotate relayouts), so the v1 design's 27 taps/conv dominated its
  runtime; 9 taps/conv + two full-width rolls is the cheaper trade.
  Matmuls at these shapes run at ~full MXU rate.
- The backward-dx kernel gathers HIERARCHICALLY instead: z→y gather of the
  conv cotangent into a lane-tile-aligned 3·P ``du9`` buffer
  (P = ceil(3·gc/128)·128), with the x taps on the output side — three
  per-dx matmuls whose f32 partials are rolled by ∓Y·Z and x-masked. This
  replaced a 27·gc-wide gather whose nine misaligned 3·gc-wide stores made
  the backward 1.7× the forward's time at fewer effective matmul FLOPs
  (93 → 60 ms/G-step measured on v5e). The same aligned-block scatter was
  tried in the FORWARD and measured slower (53.6 → 62.1 ms — its rolled
  operands are f32 partial sums, twice the bytes of the backward's bf16
  cotangents), so the forward keeps the 9-tap scatter.
- Training residuals (states/growths) and the backward's per-step
  cotangents stream J-major, matching the weight-grad scan's slicing — the
  (N, J)→(J, N) HBM transposes they previously forced cost ~28 ms/step.

Numerics follow the XLA path: matmuls accumulate f32, LeakyReLU compares in
f32 (Mosaic has no bf16 cmpf on v5e) and rounds to the compute dtype, the
×0.2 residual adds run in the compute dtype. Forward-only — used where no
gradient flows through G (the D train branch, validation SR, serving); the
G update keeps the XLA trunk whose VJP is free.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS_XY = 9  # 3×3 (dx,dy) output taps; dz lives in the matmul K dim


def _tile3(gc: int) -> int:
    """Lane-tile-aligned width of one 3·gc tap-triple block."""
    return -(-3 * gc // 128) * 128


def _n_slots(gc: int) -> int:
    """Output-lane tap slots: 9 padded so slots·gc is a lane-tile multiple."""
    if 128 % gc == 0:
        per_tile = 128 // gc
        return -(-_TAPS_XY // per_tile) * per_tile
    return _TAPS_XY


def pack_trunk_params(params_G, num_rrdb: int, num_convs: int, nf: int,
                      gc: int, dtype):
    """Repack the flax trunk params into kernel-ready stacked tensors.

    Per RDB and growth conv k (kernel (3,3,3, nf+gc·k, gc), spatial dims
    (dx,dy,dz)) the weights are split into the state part (first nf input
    channels) and the dense-growth part and laid out for the z-im2col
    matmul: K rows are dz-block-major (dz=-1 block, dz=0, dz=+1), N lanes
    hold the 9 (dx,dy) taps side by side (slot v=(dx+1)·3+(dy+1) at lanes
    [v·gc,(v+1)·gc)), padded to ``n_slots`` slots.

    Returns dict with:
      A  : (J, K, 3·nf, n_slots·gc)            state-part weights
      B  : tuple over k=1..K-1 of (J, 3, gc·k, n_slots·gc)
      Wl : (J, nf + gc·K, nf)                  LFF (1×1×1) weights
      bl : (J, 1, nf)                          LFF bias
    where J = 3·num_rrdb RDB steps and K = num_convs - 1 growth convs.
    """
    K = num_convs - 1
    ns = _n_slots(gc)

    def repack(w, cin):
        # (3,3,3,cin,gc) [dx,dy,dz] → (dz, cin, dx·dy slots, gc)
        wt = jnp.transpose(w, (2, 3, 0, 1, 4)).reshape(3, cin, _TAPS_XY, gc)
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, ns - _TAPS_XY), (0, 0)))
        return wt.reshape(3, cin, ns * gc)

    A_steps, B_steps, Wl_steps, bl_steps = [], [], [], []
    for i in range(num_rrdb):
        rrdb = params_G[f"RRDB{i}"]
        for j in range(3):
            p = rrdb[f"RDB{j}"]
            A_k, B_k = [], []
            for k in range(K):
                cin = nf + gc * k
                w = p[f"conv{k}"]["Conv_0"]["kernel"].astype(dtype)
                wt = repack(w, cin)
                A_k.append(wt[:, :nf].reshape(3 * nf, ns * gc))
                if k > 0:
                    B_k.append(wt[:, nf:])
            A_steps.append(jnp.stack(A_k))
            B_steps.append(B_k)
            lff = p["LFF"]["kernel"].astype(dtype)
            Wl_steps.append(lff.reshape(nf + gc * K, nf))
            bl_steps.append(p["LFF"]["bias"].astype(dtype).reshape(1, nf))

    return {
        "A": jnp.stack(A_steps),
        "B": tuple(jnp.stack([b[k] for b in B_steps]) for k in range(K - 1)),
        "Wl": jnp.stack(Wl_steps),
        "bl": jnp.stack(bl_steps),
    }


@functools.lru_cache(maxsize=16)
def _boundary_masks_np(X: int, Y: int, Z: int, width: int):
    """(R, 4·width) masks [z>0 | z<Z-1 | y-valid(dy=-1) | y-valid(dy=+1)],
    each pre-broadcast to ``width`` lanes."""
    r = np.arange(X * Y * Z)
    ys, zs = (r // Z) % Y, r % Z
    cols = [zs > 0, zs < Z - 1, ys > 0, ys < Y - 1]
    m = np.stack(cols, axis=1).astype(np.float32)
    return np.repeat(m, width, axis=1).reshape(len(r), 4 * width)


@functools.lru_cache(maxsize=16)
def _xy_tap_masks_np(X: int, Y: int, Z: int, gc: int):
    """(R, 9·gc) per-(dx,dy)-tap validity masks for the output scatter.

    The scatter uses CIRCULAR row rolls (Mosaic cannot concat a zeros
    block against a lane-offset slice), so the mask must also kill rows
    whose shifted source wrapped across the array ends — which coincides
    exactly with x-coordinate overflow in the x-major row order."""
    r = np.arange(X * Y * Z)
    xs, ys = r // (Y * Z), (r // Z) % Y
    cols = []
    for v in range(_TAPS_XY):
        dx, dy = v // 3 - 1, v % 3 - 1
        ok = ((xs + dx >= 0) & (xs + dx < X)
              & (ys + dy >= 0) & (ys + dy < Y))
        cols.append(np.repeat(ok[:, None], gc, axis=1))
    return np.concatenate(cols, axis=1).astype(np.float32)


def _roll_rows(v, off: int):
    """rolled[r] = v[(r + off) mod R] — static circular row shift."""
    n = v.shape[0]
    off = off % n
    if off == 0:
        return v
    return jnp.concatenate([v[off:], v[:off]], axis=0)


def _trunk_kernel(R, nf, gc, K, J, YZ, Z, ns, rdb_scale, rrdb_scale, per,
                  dtype, slope, with_residuals,
                  mnf_ref, mgc_ref, mxy_ref, x_ref, A_ref, *rest):
    B_refs = rest[: K - 1]
    rest = rest[K - 1:]
    if with_residuals:
        (Wl_ref, bl_ref, out_ref, st_res_ref, g_res_ref,
         state, rres, x3, g3) = rest
    else:
        Wl_ref, bl_ref, out_ref, state, rres, x3, g3 = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _load():
        state[...] = x_ref[0]

    @pl.when(j % per == 0)
    def _save_rrdb_in():
        rres[...] = state[...]

    s = state[...]  # (R, nf) compute dtype
    if with_residuals:
        st_res_ref[0, 0] = s  # this RDB's input, for the custom-VJP bwd
    # z-im2col of the state: block b holds s shifted by dz=b-1, boundary
    # rows zeroed (built once, reused by all K growth convs)
    x3[:, :nf] = _roll_rows(s, -1) * mnf_ref[:, :nf]
    x3[:, nf:2 * nf] = s
    x3[:, 2 * nf:] = _roll_rows(s, 1) * mnf_ref[:, nf:2 * nf]

    gcT = gc * K
    for k in range(K):
        p_all = jnp.dot(
            x3[...], A_ref[0, k], preferred_element_type=jnp.float32
        )
        if k > 0:
            for b in range(3):
                p_all = p_all + jnp.dot(
                    g3[:, b * gcT: b * gcT + gc * k],
                    B_refs[k - 1][0, b],
                    preferred_element_type=jnp.float32,
                )
        # scatter the 9 (dx,dy) taps: circular roll + per-tap x/y mask.
        # (A hierarchical aligned-block scatter — roll P-wide dy blocks
        # whole, then gc-wide dx slots — was measured SLOWER here:
        # 53.6 → 62.1 ms/fwd on v5e. The f32 partials make the wide rolls
        # cost more than the nine narrow ones; the mirrored gather DOES win
        # in the backward kernel, whose rolled operands are bf16.)
        y = jnp.zeros((R, gc), jnp.float32)
        for v in range(_TAPS_XY):
            dx, dy = v // 3 - 1, v % 3 - 1
            chunk = _roll_rows(p_all[:, v * gc:(v + 1) * gc],
                               dx * YZ + dy * Z)
            y = y + chunk * mxy_ref[:, v * gc:(v + 1) * gc]
        # LeakyReLU: compare/select in f32 (no bf16 cmpf on v5e), then
        # round — sign is rounding-invariant so this matches XLA to ULP
        yb = jnp.where(y >= 0, y, y * slope).astype(dtype)
        # dense-growth buffer: z0 block feeds later convs' K and the LFF;
        # z∓1 blocks are the growth features' own im2col (not needed for
        # the last conv, whose output only the 1×1×1 LFF consumes)
        g3[:, gcT + k * gc: gcT + (k + 1) * gc] = yb
        if k < K - 1:
            g3[:, k * gc:(k + 1) * gc] = (
                _roll_rows(yb, -1) * mgc_ref[:, :gc]
            )
            g3[:, 2 * gcT + k * gc: 2 * gcT + (k + 1) * gc] = (
                _roll_rows(yb, 1) * mgc_ref[:, gc:2 * gc]
            )

    if with_residuals:
        g_res_ref[0, 0] = g3[:, gcT:2 * gcT]  # dense activations g1..gK
    lff = jnp.dot(s, Wl_ref[0, :nf], preferred_element_type=jnp.float32)
    lff = lff + jnp.dot(
        g3[:, gcT:2 * gcT], Wl_ref[0, nf:],
        preferred_element_type=jnp.float32,
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
                     with_residuals: bool = False,
                     interpret: bool = False):
    """Run the whole RRDB trunk in one pallas call.

    packed: from :func:`pack_trunk_params`; x: (N, X, Y, Zl, nf) in the
    compute dtype. Returns the trunk output (N, X, Y, Zl, nf), same dtype
    (i.e. the value fed to lr_conv in the XLA path).

    with_residuals=True additionally returns (states, growths) — per-RDB
    input states (J, N, R, nf) and dense activations g1..gK (J, N, R, gc·K)
    — the exact residuals the hand-written training backward consumes
    (models/fused_train.py), so the VJP needs no forward recompute. They
    are emitted J-major so the backward's per-step weight-grad scan slices
    them without a (N, J)→(J, N) HBM transpose (measured ~9 ms per 1 GB
    stack on v5e).
    """
    N, X, Y, Zl, nf = x.shape
    R = X * Y * Zl
    K = num_convs - 1
    J = packed["A"].shape[0]
    ns = _n_slots(gc)
    dtype = x.dtype

    # boundary masks: [z-1 | z+1] at nf width (state im2col) and
    # [z-1 | z+1 | dy=-1 | dy=+1] at gc width (growth im2col + scatter)
    m_nf = _boundary_masks_np(X, Y, Zl, nf)[:, : 2 * nf]
    m_gc = _boundary_masks_np(X, Y, Zl, gc)
    m_xy = _xy_tap_masks_np(X, Y, Zl, gc)
    m_nf = jnp.asarray(m_nf, dtype)
    m_gc = jnp.asarray(m_gc, dtype)
    m_xy = jnp.asarray(m_xy, dtype)

    x2 = x.reshape(N, R, nf)
    kernel = functools.partial(
        _trunk_kernel, R, nf, gc, K, J, Y * Zl, Zl, ns,
        rdb_scale, rrdb_scale, rdbs_per_rrdb, dtype, negative_slope,
        with_residuals,
    )
    gcT = gc * K
    in_specs = [
        pl.BlockSpec(m_nf.shape, lambda b, j: (0, 0)),
        pl.BlockSpec(m_gc.shape, lambda b, j: (0, 0)),
        pl.BlockSpec(m_xy.shape, lambda b, j: (0, 0)),
        pl.BlockSpec((1, R, nf), lambda b, j: (b, 0, 0)),
        pl.BlockSpec((1,) + packed["A"].shape[1:], lambda b, j: (j, 0, 0, 0)),
        *[
            pl.BlockSpec((1,) + bk.shape[1:], lambda b, j: (j, 0, 0, 0))
            for bk in packed["B"]
        ],
        pl.BlockSpec((1, nf + gcT, nf), lambda b, j: (j, 0, 0)),
        pl.BlockSpec((1, 1, nf), lambda b, j: (j, 0, 0)),
    ]
    out_specs = pl.BlockSpec((1, R, nf), lambda b, j: (b, 0, 0))
    out_shape = jax.ShapeDtypeStruct((N, R, nf), dtype)
    if with_residuals:
        out_specs = (
            out_specs,
            pl.BlockSpec((1, 1, R, nf), lambda b, j: (j, b, 0, 0)),
            pl.BlockSpec((1, 1, R, gcT), lambda b, j: (j, b, 0, 0)),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((J, N, R, nf), dtype),
            jax.ShapeDtypeStruct((J, N, R, gcT), dtype),
        )
    out = pl.pallas_call(
        kernel,
        grid=(N, J),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((R, nf), dtype),        # trunk state
            pltpu.VMEM((R, nf), dtype),        # RRDB residual
            pltpu.VMEM((R, 3 * nf), dtype),    # state z-im2col
            pltpu.VMEM((R, 3 * gcT), dtype),   # growth z-im2col
        ],
        # persistent activations + f32 tap temps exceed the 16 MB default
        # scoped-vmem budget; v5e/v4 have 128 MiB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(m_nf, m_gc, m_xy, x2, packed["A"], *packed["B"], packed["Wl"],
      packed["bl"])
    if with_residuals:
        trunk, states, growths = out
        return trunk.reshape(N, X, Y, Zl, nf), states, growths
    return out.reshape(N, X, Y, Zl, nf)


def trunk_fusable(num_convs: int, gc: int, lff_kern_size: int,
                  conv_mode: str, lr_spatial: Sequence[int],
                  max_rows: int = 4096) -> bool:
    """Whether the fused trunk supports this generator geometry.

    Row cap keeps all persistent VMEM buffers within budget; larger volumes
    fall back to the XLA trunk (serving tiles big fields anyway).
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


# --------------------------------------------------------------- backward
def pack_trunk_params_bwd(params_G, num_rrdb: int, num_convs: int, nf: int,
                          gc: int, dtype):
    """Transposed weights for the backward-dx kernel (v2 layout).

    The kernel gathers only the z and y taps of the cotangent (into a
    lane-tile-aligned ``du9`` buffer of three P-wide dy blocks, each
    [dz·gc + o] padded to P = ceil(3·gc/128)·128 lanes); the x taps live on
    the OUTPUT side as three per-dx matmuls whose partials are row-rolled by
    ∓Y·Z and masked. So per growth conv k the weights split into
    At (3, 3P, nf) — dx blocks, rows (dy, dz, o) — and the growth part
    Bt (3, 3P, gc·K) with columns zero-padded from gc·k to gc·K so the
    growth accumulator update is one full-width add. LFF: WlT (nf, nf+gc·K).
    """
    K = num_convs - 1
    gcT = gc * K
    P = _tile3(gc)
    At_steps, Bt_steps, WlT_steps = [], [], []
    for i in range(num_rrdb):
        rrdb = params_G[f"RRDB{i}"]
        for j in range(3):
            p = rrdb[f"RDB{j}"]
            At_k, Bt_k = [], []
            for k in range(K):
                cin = nf + gc * k
                w = p[f"conv{k}"]["Conv_0"]["kernel"].astype(dtype)
                # (dx,dy,dz,cin,gc) → dx blocks of rows (dy, dz·gc+o)
                wt = jnp.transpose(w, (0, 1, 2, 4, 3)).reshape(
                    3, 3, 3 * gc, cin
                )
                wt = jnp.pad(
                    wt, ((0, 0), (0, 0), (0, P - 3 * gc), (0, 0))
                ).reshape(3, 3 * P, cin)
                At_k.append(wt[:, :, :nf])
                if k > 0:
                    Bt_k.append(jnp.pad(
                        wt[:, :, nf:], ((0, 0), (0, 0), (0, gcT - gc * k))
                    ))
            At_steps.append(jnp.stack(At_k))
            if K > 1:
                Bt_steps.append(jnp.stack(Bt_k))
            lff = p["LFF"]["kernel"].astype(dtype).reshape(nf + gcT, nf)
            WlT_steps.append(lff.T)
    return {
        "At": jnp.stack(At_steps),
        "Bt": jnp.stack(Bt_steps) if K > 1 else None,
        "WlT": jnp.stack(WlT_steps),
    }


def _trunk_bwd_kernel(R, nf, gc, K, J, YZ, Z, P, rdb_scale, rrdb_scale, per,
                      dtype, slope,
                      mz_ref, my_ref, mxs_ref, mxg_ref, g_ref, dout_ref,
                      At_ref, *rest):
    if K > 1:
        Bt_ref = rest[0]
        rest = rest[1:]
    (WlT_ref, dx_ref, du_ref, dlff_ref,
     ds_s, pend_s, dg_s, du9_s) = rest
    jj = pl.program_id(1)  # step jj handles RDB j' = J-1-jj

    @pl.when(jj == 0)
    def _load():
        ds_s[...] = dout_ref[0]
        pend_s[...] = jnp.zeros_like(pend_s)
        du9_s[...] = jnp.zeros_like(du9_s)  # pad lanes must stay zero

    jp = (J - 1) - jj
    is_end = (jp % per) == (per - 1)
    is_start = (jp % per) == 0

    ds = ds_s[...]
    d_r = jnp.where(is_end, ds * jnp.asarray(rrdb_scale, dtype), ds)
    pend_s[...] = jnp.where(is_end, ds, pend_s[...])

    d_lff = d_r * jnp.asarray(rdb_scale, dtype)
    dlff_ref[0, 0] = d_lff
    d_catl = jnp.dot(d_lff, WlT_ref[0],
                     preferred_element_type=jnp.float32)
    d_s = d_r + d_catl[:, :nf].astype(dtype)
    dg_s[...] = d_catl[:, nf:].astype(dtype)

    g = g_ref[0, 0]  # (R, gc·K) dense activations of this RDB
    gcT = gc * K
    for k in range(K - 1, -1, -1):
        g_k = g[:, k * gc:(k + 1) * gc].astype(jnp.float32)
        lmask = jnp.where(
            g_k >= 0, jnp.float32(1.0), jnp.float32(slope)
        ).astype(dtype)
        d_u = dg_s[:, k * gc:(k + 1) * gc] * lmask
        du_ref[0, 0, :, k * gc:(k + 1) * gc] = d_u
        # Hierarchical z→y gather of the cotangent into du9: three P-wide
        # dy blocks, each holding the 3·gc z-im2col of d_u padded to a full
        # lane tile. Every store is lane-tile aligned (the v1 design's nine
        # 3·gc-wide stores at 3·gc-multiple offsets each paid a lane
        # relayout — measured as most of the fwd/bwd kernel gap).
        mid = P
        du9_s[:, mid + gc: mid + 2 * gc] = d_u
        du9_s[:, mid: mid + gc] = (
            _roll_rows(d_u, 1) * mz_ref[:, gc:2 * gc]    # src z+1 valid
        )
        du9_s[:, mid + 2 * gc: mid + 3 * gc] = (
            _roll_rows(d_u, -1) * mz_ref[:, :gc]         # src z−1 valid
        )
        mid_blk = du9_s[:, P:2 * P]
        du9_s[:, :P] = _roll_rows(mid_blk, Z) * my_ref[:, :P]
        du9_s[:, 2 * P:] = _roll_rows(mid_blk, -Z) * my_ref[:, P:]
        du9 = du9_s[...]
        # The x taps live on the OUTPUT side: per-dx matmuls whose f32
        # partials are row-rolled by ∓Y·Z and x-masked (valid because all
        # terms of one partial share dx, and rows are x-major so x overflow
        # coincides with the circular-roll wrap).
        q0 = jnp.dot(du9, At_ref[0, k, 1],
                     preferred_element_type=jnp.float32)
        qm = jnp.dot(du9, At_ref[0, k, 0],
                     preferred_element_type=jnp.float32)
        qp = jnp.dot(du9, At_ref[0, k, 2],
                     preferred_element_type=jnp.float32)
        d_cat_s = (q0 + _roll_rows(qm, YZ) * mxs_ref[:, :nf]
                   + _roll_rows(qp, -YZ) * mxs_ref[:, nf:])
        d_s = d_s + d_cat_s.astype(dtype)
        if k > 0:
            h0 = jnp.dot(du9, Bt_ref[0, k - 1, 1],
                         preferred_element_type=jnp.float32)
            hm = jnp.dot(du9, Bt_ref[0, k - 1, 0],
                         preferred_element_type=jnp.float32)
            hp = jnp.dot(du9, Bt_ref[0, k - 1, 2],
                         preferred_element_type=jnp.float32)
            d_cat_g = (h0 + _roll_rows(hm, YZ) * mxg_ref[:, :gcT]
                       + _roll_rows(hp, -YZ) * mxg_ref[:, gcT:])
            # Bt columns ≥ gc·k are zero-padded, so this is one full-width
            # aligned add (block k is already consumed above).
            dg_s[...] = dg_s[...] + d_cat_g.astype(dtype)

    d_s = d_s + jnp.where(is_start, pend_s[...], jnp.zeros_like(d_s))
    pend_s[...] = jnp.where(
        is_start, jnp.zeros_like(pend_s), pend_s[...]
    )
    ds_s[...] = d_s

    @pl.when(jj == J - 1)
    def _flush():
        dx_ref[0] = ds_s[...]


def fused_rrdb_trunk_bwd(packed_t, growths, d_out, *, gc: int,
                         num_convs: int, rdb_scale: float = 0.2,
                         rrdb_scale: float = 0.2, rdbs_per_rrdb: int = 3,
                         negative_slope: float = 0.2,
                         interpret: bool = False):
    """Backward-dx pass of the fused trunk.

    packed_t: from :func:`pack_trunk_params_bwd`; growths: the (J, N, R,
    gc·K) dense activations saved by the forward kernel; d_out: trunk
    output cotangent (N, X, Y, Zl, nf).

    Returns (d_x, dU, dLFF): the trunk-input cotangent plus the per-step
    pre-activation cotangents d_u (J, N, R, gc·K) and d_lff (J, N, R, nf)
    that the XLA side contracts into weight gradients (models/fused_train).
    All J-stacked tensors are J-major to match the weight-grad scan.
    """
    N, X, Y, Zl, nf = d_out.shape
    R = X * Y * Zl
    K = num_convs - 1
    J = packed_t["At"].shape[0]
    dtype = d_out.dtype
    gcT = gc * K
    P = _tile3(gc)

    bm = _boundary_masks_np(X, Y, Zl, 1)  # (R, 4): z>0 | z<Z-1 | y>0 | y<Y-1
    r = np.arange(R)
    xs = r // (Y * Zl)
    m_z = jnp.asarray(_boundary_masks_np(X, Y, Zl, gc)[:, :2 * gc], dtype)
    # dy=−1 block needs y<Y-1 (col 3); dy=+1 needs y>0 (col 2)
    m_y = jnp.asarray(
        np.concatenate([np.repeat(bm[:, 3:4], P, 1),
                        np.repeat(bm[:, 2:3], P, 1)], axis=1), dtype)
    # x masks multiply f32 matmul partials: dx=−1 needs x<X-1, dx=+1 x>0
    mx2 = np.stack([xs < X - 1, xs > 0], axis=1).astype(np.float32)
    m_xs = jnp.asarray(np.repeat(mx2, nf, axis=1).reshape(R, 2 * nf))
    m_xg = jnp.asarray(np.repeat(mx2, gcT, axis=1).reshape(R, 2 * gcT))

    d2 = d_out.reshape(N, R, nf)
    kernel = functools.partial(
        _trunk_bwd_kernel, R, nf, gc, K, J, Y * Zl, Zl, P,
        rdb_scale, rrdb_scale, rdbs_per_rrdb, dtype, negative_slope,
    )
    jrev = J - 1
    in_specs = [
        pl.BlockSpec(m_z.shape, lambda b, j: (0, 0)),
        pl.BlockSpec(m_y.shape, lambda b, j: (0, 0)),
        pl.BlockSpec(m_xs.shape, lambda b, j: (0, 0)),
        pl.BlockSpec(m_xg.shape, lambda b, j: (0, 0)),
        pl.BlockSpec((1, 1, R, gcT), lambda b, j: (jrev - j, b, 0, 0)),
        pl.BlockSpec((1, R, nf), lambda b, j: (b, 0, 0)),
        pl.BlockSpec(
            (1,) + packed_t["At"].shape[1:],
            lambda b, j: (jrev - j, 0, 0, 0, 0)
        ),
    ]
    operands = [m_z, m_y, m_xs, m_xg, growths, d2, packed_t["At"]]
    if K > 1:
        in_specs.append(pl.BlockSpec(
            (1,) + packed_t["Bt"].shape[1:],
            lambda b, j: (jrev - j, 0, 0, 0, 0)
        ))
        operands.append(packed_t["Bt"])
    in_specs.append(
        pl.BlockSpec((1, nf, nf + gcT), lambda b, j: (jrev - j, 0, 0))
    )
    operands.append(packed_t["WlT"])
    out = pl.pallas_call(
        kernel,
        grid=(N, J),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, R, nf), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, R, gcT), lambda b, j: (jrev - j, b, 0, 0)),
            pl.BlockSpec((1, 1, R, nf), lambda b, j: (jrev - j, b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, R, nf), dtype),
            jax.ShapeDtypeStruct((J, N, R, gcT), dtype),
            jax.ShapeDtypeStruct((J, N, R, nf), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, nf), dtype),          # running ds
            pltpu.VMEM((R, nf), dtype),          # pending RRDB skip
            pltpu.VMEM((R, gcT), dtype),         # d_growth accumulator
            pltpu.VMEM((R, 3 * P), dtype),       # aligned z/y gather of d_u
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    d_x, dU, dLFF = out
    return d_x.reshape(N, X, Y, Zl, nf), dU, dLFF
