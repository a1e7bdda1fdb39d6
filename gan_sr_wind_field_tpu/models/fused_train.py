"""Trainable generator forward with the fused Pallas trunk (custom VJP).

The G update differentiates through the generator; the Pallas trunk kernel
is forward-only, so this module pairs it with a HAND-WRITTEN backward:

- forward: the fused kernel (ops/pallas/rdb_trunk.py) run with
  ``with_residuals=True`` — it emits every RDB's input state and dense
  growth activations, i.e. exactly the residuals XLA's own autodiff would
  have stashed. No forward recompute in the VJP (unlike remat).
- backward: one ``lax.scan`` over the RDB steps in reverse. Each step
  back-propagates through LFF and the dense growth convs using
  ``jax.linear_transpose`` of the individual conv ops (convolution is
  linear in each argument, so the transpose is a single transposed conv —
  nothing is re-executed). The RRDB skip cotangent is carried to the
  RRDB-start step through the scan carry.

Numerics match ``jax.grad`` of the flax trunk (tested against the autodiff
oracle in float32; bf16 within rounding).

``apply_trainable(G, params, lr, z, ...)`` is the drop-in replacement for
``G.apply({"params": params}, lr, z, train=True, rng_key=...)`` used by the
G-loss branch when ``use_fused_trunk`` is enabled (train/gan.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.models.fused_apply import generator_forward
from gan_sr_wind_field_tpu.ops.pallas.rdb_trunk import (
    fused_rrdb_trunk,
    fused_rrdb_trunk_bwd,
    pack_trunk_params,
    pack_trunk_params_bwd,
)

_DN = ("NDHWC", "DHWIO", "NDHWC")

# lax.scan unroll factor for the dW stage (measurement knob; see trunk_bwd)
_DW_UNROLL = int(os.environ.get("WINDSR_DW_UNROLL", "1"))

# dW stage formulation A/B (VERDICT r4 weak 4): "allj" replaces the
# J-step lax.scan with ONE feature-grouped conv per operand pair that
# consumes the Pallas streams' natural J-major layout directly (the scan
# body's transposed conv prefers N-in-sublanes, forcing XLA to relayout
# all four ~1 GB streams at ~3 ms each before the loop). J moves into the
# CHANNEL dim of the small cotangent operands instead (explicit
# transpose), and the scan shell's dynamic-slice/DUS traffic disappears.
_DW_ALLJ = os.environ.get("WINDSR_DW_ALLJ", "0") == "1"


def _conv(v, w, pad):
    return jax.lax.conv_general_dilated(
        v, w, window_strides=(1, 1, 1), padding=[(pad, pad)] * 3,
        dimension_numbers=_DN,
    )


# NOTE (measured, v5e): rewriting the conv input-grad as an XLA-level
# im2col (27 shifted cotangent copies + one wide-K matmul) is 4-5x SLOWER
# than the native transposed conv — the shifted-copy concats relayout badly
# on the (…, z=10, C) minor dims. The dx bottleneck (K=gc per tap) is only
# fixable inside a Pallas kernel where the copies stay in registers.


def _dw_allj(states, growths, dU, dLFF, *, J, nf, gcT):
    """All-J dW stage: one feature-grouped conv per (residual, cotangent)
    pair instead of the J-step scan.

    Formulation: the grad-of-weight conv contracts over (n, xyz) per step
    j — block-diagonal in J. Expressed as ONE XLA conv by marking the
    residual's flattened (J·N) leading dim as the contracted FEATURE
    (lhs spec "CDHWN" — a free reshape in the streams' natural J-major
    layout) with ``feature_group_count=J``, and moving J into the OUTPUT
    channel dim of the small cotangent operand (rhs spec "IDHWO",
    explicit (J,N,…,c) → (N,…,J·c) transpose — the only copy this
    formulation pays; the scan relayouts all four streams). Group j of the
    J·c output channels then contracts exactly residual block j against
    cotangent block j — no (cin, cout) or cross-step mixing.

    Returns the same stacked (J, …) grads as the scan path.
    """
    sp = states.shape[1:-1]  # (N, X, Y, Zl)
    flat = lambda a, c: a.reshape((J * sp[0],) + sp[1:] + (c,))
    to_ch = lambda a, c: jnp.transpose(a, (1, 2, 3, 4, 0, 5)).reshape(
        sp + (J * c,)
    )
    dn = ("CDHWN", "IDHWO", "NDHWC")

    def gconv(lhs, rhs, pad):
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1, 1, 1), padding=[(pad, pad)] * 3,
            dimension_numbers=dn, feature_group_count=J,
        )

    s_flat, g_flat = flat(states, nf), flat(growths, gcT)
    du_ch, dlff_ch = to_ch(dU, gcT), to_ch(dLFF, nf)

    def unpack(out, cin, c):
        # (cin, kd, kh, kw, J*c) -> (J, kd, kh, kw, cin, c)
        k = out.shape[1:4]
        out = out.reshape((cin,) + k + (J, c))
        return jnp.transpose(out, (4, 1, 2, 3, 0, 5))

    dWall = jnp.concatenate([
        unpack(gconv(s_flat, du_ch, 1), nf, gcT),
        unpack(gconv(g_flat, du_ch, 1), gcT, gcT),
    ], axis=4)
    dWl = jnp.concatenate([
        unpack(gconv(s_flat, dlff_ch, 0), nf, nf),
        unpack(gconv(g_flat, dlff_ch, 0), gcT, nf),
    ], axis=4)
    dbl = jnp.sum(dLFF, axis=(1, 2, 3, 4))
    return dWall, dWl, dbl


def _unstack_grads(dWk, dWl, dbl, num_rrdb, K):
    """Stacked (J, ...) weight grads → the trunk params tree (float32)."""
    tree = {}
    step = 0
    for i in range(num_rrdb):
        rrdb = {}
        for j in range(3):
            rdb = {}
            for k in range(K):
                rdb[f"conv{k}"] = {
                    "Conv_0": {"kernel": dWk[k][step].astype(jnp.float32)}
                }
            rdb["LFF"] = {
                "kernel": dWl[step].astype(jnp.float32),
                "bias": dbl[step].astype(jnp.float32),
            }
            rrdb[f"RDB{j}"] = rdb
            step += 1
        tree[f"RRDB{i}"] = rrdb
    return tree


def make_trainable_trunk(G, interpret: bool = False):
    """custom_vjp trunk: pallas forward + scan-over-RDBs XLA backward."""
    nf = G.num_features
    gc = G.rdb_growth_channels
    K = G.num_rdb_convs - 1
    num_rrdb = G.num_rrdb
    J = 3 * num_rrdb
    per = 3
    rdb_s, rrdb_s = G.rdb_residual_scaling, G.rrdb_residual_scaling
    slope = G.negative_slope
    cdt = G.dtype or jnp.float32
    gcT = gc * K

    def _fwd_kernel(trunk_params, x):
        packed = pack_trunk_params(trunk_params, num_rrdb,
                                   G.num_rdb_convs, nf, gc, cdt)
        return fused_rrdb_trunk(
            packed, x, gc=gc, num_convs=G.num_rdb_convs,
            rdb_scale=rdb_s, rrdb_scale=rrdb_s, negative_slope=slope,
            with_residuals=True, interpret=interpret,
        )

    @jax.custom_vjp
    def trunk(trunk_params, x):
        out, _, _ = _fwd_kernel(trunk_params, x)
        return out

    def trunk_fwd(trunk_params, x):
        out, states, growths = _fwd_kernel(trunk_params, x)
        return out, (trunk_params, states, growths, x.shape)

    def trunk_bwd(res, d_out):
        trunk_params, states, growths, xshape = res
        N, X, Y, Zl, _ = xshape
        sp = (N, X, Y, Zl)

        # dx + pre-activation cotangents: the Pallas backward kernel.
        # (XLA's transposed growth convs run at K=gc per tap — ~20% MXU —
        # so the dx chain is a kernel; the weight grads below are already
        # well-shaped convs and stay in XLA.)
        packed_t = pack_trunk_params_bwd(
            trunk_params, num_rrdb, K + 1, nf, gc, cdt
        )
        d_x, dU, dLFF = fused_rrdb_trunk_bwd(
            packed_t, growths,
            d_out.astype(cdt).reshape(sp + (nf,)),
            gc=gc, num_convs=K + 1, rdb_scale=rdb_s, rrdb_scale=rrdb_s,
            negative_slope=slope, interpret=interpret,
        )

        # weight grads: carry-free scan over the RDB steps. The kernels
        # emit the J-stacked residuals/cotangents J-major, so these are
        # free reshapes, not (N, J)→(J, N) HBM transposes.
        def to_j(a, c):
            return a.reshape((J,) + sp + (c,))

        states = to_j(states, nf)
        growths = to_j(growths, gcT)
        dU = to_j(dU, gcT)
        dLFF = to_j(dLFF, nf)

        # One ALL-PAIRS weight-grad conv per step: the per-conv dW has only
        # gc output channels (4x MXU lane padding at gc=32); contracting the
        # full cat against the full dU runs at full lane utilisation, and
        # each true dW_k is an exact slice of the result (the transpose
        # contraction never mixes (cin, cout) pairs). ~27% more raw FLOPs
        # for ~3x fewer padded MACs. The contraction is also blockwise in
        # cin, so the dense cat NEVER materializes: states and growths each
        # contract separately (both already 128-wide) and the results
        # concatenate on the tiny weight axis.
        w_s = jax.ShapeDtypeStruct((3, 3, 3, nf, gcT), cdt)
        w_g = jax.ShapeDtypeStruct((3, 3, 3, gcT, gcT), cdt)
        wl_s = jax.ShapeDtypeStruct((1, 1, 1, nf, nf), cdt)
        wl_g = jax.ShapeDtypeStruct((1, 1, 1, gcT, nf), cdt)

        def wstep(_, xs):
            s, g, du, dlff = xs
            dWl = jnp.concatenate([
                jax.linear_transpose(lambda w: _conv(s, w, 0), wl_s)(dlff)[0],
                jax.linear_transpose(lambda w: _conv(g, w, 0), wl_g)(dlff)[0],
            ], axis=3)
            dbl = jnp.sum(dlff, axis=(0, 1, 2, 3))
            dWall = jnp.concatenate([
                jax.linear_transpose(lambda w: _conv(s, w, 1), w_s)(du)[0],
                jax.linear_transpose(lambda w: _conv(g, w, 1), w_g)(du)[0],
            ], axis=3)
            return None, (dWall, dWl, dbl)

        xs = (states, growths, dU, dLFF)
        if _DW_ALLJ:
            dWall_st, dWl_st, dbl_st = _dw_allj(
                states, growths, dU, dLFF, J=J, nf=nf, gcT=gcT
            )
        else:
            # unroll MEASURED A REGRESSION on v5e (G step 424.2 →
            # 429.7/435.2 ms at unroll 1/4/8, scripts/probe_g_step.py): the
            # rolled while-loop's double-buffered slice/DUS schedule beats
            # the unrolled body's inflated live ranges. Keep 1; knob
            # retained for re-measurement.
            _, (dWall_st, dWl_st, dbl_st) = jax.lax.scan(
                wstep, None, xs, unroll=_DW_UNROLL
            )
        dWk_st = tuple(
            dWall_st[..., : nf + gc * k, k * gc:(k + 1) * gc]
            for k in range(K)
        )
        d_params = _unstack_grads(dWk_st, dWl_st, dbl_st, num_rrdb, K)
        return d_params, d_x.astype(cdt)

    trunk.defvjp(trunk_fwd, trunk_bwd)
    return trunk


@functools.lru_cache(maxsize=8)
def _cached_trainable_trunk(G, interpret):
    return make_trainable_trunk(G, interpret)


def apply_trainable(G, params, lr, z_terrain, train: bool = True,
                    dropout_key=None, interpret: bool = False):
    """Differentiable generator forward with the fused Pallas trunk.

    Gradients flow into ``params`` (trunk via the custom VJP, head/tail via
    XLA autodiff) and match ``jax.grad`` of ``G.apply`` to rounding.
    """
    trunk_cv = _cached_trainable_trunk(G, interpret)
    trunk_params = {
        f"RRDB{i}": params[f"RRDB{i}"] for i in range(G.num_rrdb)
    }

    def trunk_fn(x):
        return trunk_cv(trunk_params, x)

    return generator_forward(
        G, params, lr, z_terrain, trunk_fn,
        train=train, dropout_key=dropout_key, interpret=interpret,
    )
