"""Calibrated int8 quantization of the RRDB trunk (serving only).

Extends the int8 HR-head scheme (ops/quant.py) to the trunk — the FLOPs
majority of inference — to settle whether int8 serving is a real lever
or a documented negative (VERDICT r2 weak 2):

- per-PART activation scales: every tensor that enters trunk convs (the
  RDB input ``x`` and each dense growth output ``c_k``) gets per-channel
  symmetric scales from calibration, and is quantized ONCE when
  produced; dense-concat inputs are concatenations of already-quantized
  parts (int8 concat is free),
- per-output-channel symmetric int8 weights, with the input-part scales
  folded exactly into the kernel's c_in axis (``conv(x/s, W*s)`` —
  same exact reassociation as ops/quant.py:fold_quantize_kernel),
- int8 x int8 -> int32 convs, dequantized in the epilogue; leaky-ReLU,
  residual adds and the x0.2 scalings stay float (they are linear/cheap
  VPU work and the residual ladder must not accumulate quant error).

The reference trunk math mirrored here is models/blocks.py RDB/RRDB
(reference torch_blocks.py:192-330): per RDB, ``num_convs-1`` k=3 dense
conv+lrelu growth layers concatenated, an LFF conv WITH bias, residual
x rdb_scale; per RRDB, 3 RDBs + residual x rrdb_scale; the trunk is
``num_rrdb`` sequential RRDBs (the surrounding lr_conv/long-skip stays
in models/fused_apply.py).

Measured verdict (scripts/probe_quant_trunk.py, real v5e): see
docs/PERF.md — the per-conv probe (scripts/probe_int8_conv.py) already
showed the lane-bound gc=32 growth convs gain only ~1.17x over XLA bf16,
while the Pallas bf16 fused trunk beats XLA bf16 by more than that, so
this path exists to make the negative measurable end-to-end, and as a
small-batch latency option together with the int8 head.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.ops.quant import (
    fold_quantize_kernel,
    quantize_act,
    scales_from_amax,
)

_DN = ("NDHWC", "DHWIO", "NDHWC")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantizedTrunk:
    """Calibrated int8 trunk weights+scales, stacked over the
    J = 3*num_rrdb RDB steps (step j = RRDB ``j//3``, RDB ``j%3``)."""

    s_x: jax.Array                     # (J, nf) act scales of the RDB input
    s_c: jax.Array                     # (J, K, gc) act scales per growth out
    wq: Tuple[jax.Array, ...]          # k: (J, 3,3,3, nf+gc*k, gc) int8
    sw: Tuple[jax.Array, ...]          # k: (J, gc) dequant scales
    wq_lff: jax.Array                  # (J, lk,lk,lk, nf+gc*K, nf) int8
    sw_lff: jax.Array                  # (J, nf)
    b_lff: jax.Array                   # (J, nf) f32
    num_rrdb: int = dataclasses.field(metadata={"static": True}, default=0)
    num_convs: int = dataclasses.field(metadata={"static": True}, default=5)
    lff_kern: int = dataclasses.field(metadata={"static": True}, default=1)
    rdb_scale: float = dataclasses.field(
        metadata={"static": True}, default=0.2
    )
    rrdb_scale: float = dataclasses.field(
        metadata={"static": True}, default=0.2
    )
    negative_slope: float = dataclasses.field(
        metadata={"static": True}, default=0.2
    )


def _conv(x, w, pad, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=[(pad, pad)] * 3,
        dimension_numbers=_DN, preferred_element_type=preferred,
    )


def _trunk_layout(params_G, num_rrdb):
    """Yield the per-RDB-step param dicts in trunk order."""
    for i in range(num_rrdb):
        rrdb = params_G[f"RRDB{i}"]
        for j in range(3):
            yield rrdb[f"RDB{j}"]


def trunk_reference_amax(params_G, x, *, num_rrdb, num_convs, lff_kern,
                         rdb_scale, rrdb_scale, negative_slope):
    """Exact (f32) trunk forward that also returns the calibration amaxes.

    Returns ``(y, amax_x (J, nf), amax_c (J, K, gc))`` — per-channel
    abs-max of every tensor the int8 path will quantize. The forward is
    the oracle the int8 path is tested against (and itself parity-tested
    against the flax trunk, tests/test_quant_trunk.py).
    """
    K = num_convs - 1
    lp = (lff_kern - 1) // 2
    x = x.astype(jnp.float32)
    ax_steps, ac_steps = [], []

    out = x
    steps = list(_trunk_layout(params_G, num_rrdb))
    si = 0
    for i in range(num_rrdb):
        rr_in = out
        for j in range(3):
            p = steps[si]
            si += 1
            feats = out
            ax_steps.append(
                jnp.max(jnp.abs(out), axis=tuple(range(out.ndim - 1)))
            )
            ac_k = []
            for k in range(K):
                w = p[f"conv{k}"]["Conv_0"]["kernel"].astype(jnp.float32)
                c = _conv(feats, w, 1)
                c = jax.nn.leaky_relu(c, negative_slope=negative_slope)
                ac_k.append(
                    jnp.max(jnp.abs(c), axis=tuple(range(c.ndim - 1)))
                )
                feats = jnp.concatenate([feats, c], axis=-1)
            ac_steps.append(jnp.stack(ac_k))
            wl = p["LFF"]["kernel"].astype(jnp.float32)
            bl = p["LFF"]["bias"].astype(jnp.float32)
            res = _conv(feats, wl, lp) + bl
            out = res * rdb_scale + out
        out = out * rrdb_scale + rr_in
    return out, jnp.stack(ax_steps), jnp.stack(ac_steps)


def quantize_trunk(params_G, amax_x, amax_c, *, num_rrdb, num_convs,
                   lff_kern, rdb_scale, rrdb_scale,
                   negative_slope) -> QuantizedTrunk:
    """Fold the calibrated activation scales into int8 trunk weights.

    ``amax_x``/``amax_c`` come from `trunk_reference_amax` (max-folded
    over the calibration set host-side).
    """
    K = num_convs - 1
    s_x = scales_from_amax(jnp.asarray(amax_x, jnp.float32))    # (J, nf)
    s_c = scales_from_amax(jnp.asarray(amax_c, jnp.float32))    # (J, K, gc)

    wq_k = [[] for _ in range(K)]
    sw_k = [[] for _ in range(K)]
    wql, swl, bl_s = [], [], []
    for j, p in enumerate(_trunk_layout(params_G, num_rrdb)):
        part_scales = [s_x[j]] + [s_c[j, k] for k in range(K)]
        for k in range(K):
            s_in = jnp.concatenate(part_scales[: k + 1])
            w = p[f"conv{k}"]["Conv_0"]["kernel"]
            wq, sw = fold_quantize_kernel(w, s_in)
            wq_k[k].append(wq)
            sw_k[k].append(sw)
        s_in = jnp.concatenate(part_scales)
        wq, sw = fold_quantize_kernel(p["LFF"]["kernel"], s_in)
        wql.append(wq)
        swl.append(sw)
        bl_s.append(p["LFF"]["bias"].astype(jnp.float32))

    return QuantizedTrunk(
        s_x=s_x, s_c=s_c,
        wq=tuple(jnp.stack(w) for w in wq_k),
        sw=tuple(jnp.stack(s) for s in sw_k),
        wq_lff=jnp.stack(wql), sw_lff=jnp.stack(swl),
        b_lff=jnp.stack(bl_s),
        num_rrdb=int(num_rrdb), num_convs=int(num_convs),
        lff_kern=int(lff_kern), rdb_scale=float(rdb_scale),
        rrdb_scale=float(rrdb_scale),
        negative_slope=float(negative_slope),
    )


def trunk_int8_apply(qt: QuantizedTrunk, x, out_dtype=jnp.bfloat16):
    """int8 trunk forward: same math as `trunk_reference_amax`'s forward
    up to the int8 activation/weight rounding."""
    K = qt.num_convs - 1
    lp = (qt.lff_kern - 1) // 2
    cdt = out_dtype
    out = x.astype(cdt)

    j = 0
    for _ in range(qt.num_rrdb):
        rr_in = out
        for _ in range(3):
            parts_q = [quantize_act(out, qt.s_x[j])]
            for k in range(K):
                inq = (parts_q[0] if k == 0
                       else jnp.concatenate(parts_q, axis=-1))
                c32 = _conv(inq, qt.wq[k][j], 1, preferred=jnp.int32)
                c = c32.astype(jnp.float32) * qt.sw[k][j]
                c = jax.nn.leaky_relu(
                    c, negative_slope=qt.negative_slope
                )
                parts_q.append(quantize_act(c, qt.s_c[j, k]))
            inq = jnp.concatenate(parts_q, axis=-1)
            r32 = _conv(inq, qt.wq_lff[j], lp, preferred=jnp.int32)
            res = r32.astype(jnp.float32) * qt.sw_lff[j] + qt.b_lff[j]
            out = (res * qt.rdb_scale).astype(cdt) + out
            j += 1
        out = (out * qt.rrdb_scale + rr_in).astype(cdt)
    return out
