"""Post-training int8 quantization for the SERVING head convs.

The v5e MXU runs int8 matmuls at ~2x its bf16 rate, and XLA:TPU lowers
int8 ``conv_general_dilated`` (with int32 accumulation) onto that path —
measured on the generator's own head geometry (scripts/probe_int8_conv.py):
hr_conv0's full-lane 128-out k=5^3 main conv 28.8 -> 16.2 ms, the unsplit
144-out 95.3 -> 50.4 ms, while the lane-bound growth convs gain only 1.17x
(so the trunk stays the bf16 Pallas kernel).

Scheme — chosen so the int8 noise floor sits AT the existing bf16 one
(bf16 mantissa step 2^-8 = 0.39% ~= per-channel int8 rounding):

- per-INPUT-channel activation scales, folded exactly into the kernel
  (the conv contracts over c_in, so ``conv(x, W) == conv(x / s[ci],
  W * s[ci])`` — no per-tensor activation compromise),
- per-OUTPUT-channel symmetric int8 weights on the folded kernel,
- int8 x int8 -> int32 accumulation, dequantized in the conv epilogue.

Only the no-grad serving forward uses this (WindFieldSR.quantize);
training and the D-step keep exact reference numerics.

End-to-end serving A/B on real TPU (scripts/probe_quant_serve.py):
batch 32: 126.5 -> 119.3 ms (1.06x, 10.36 -> 10.98 Mvox/s); batch 128:
417.1 -> 465.6 ms (0.90x — the quantize/dequantize epilogues outgrow the
MXU win once the big batch saturates the chip). Output agreement
rel-RMS 0.24%, 67.7 dB PSNR vs the exact path (the SR task band is
33-41 dB). So: an opt-in LATENCY lever for small-batch serving; the
default throughput path (batch 128) stays bf16.

Reference counterpart: none — the reference serves fp32 single samples
(test.py:106-121). This is a deployment-tier addition.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_DN = ("NDHWC", "DHWIO", "NDHWC")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuantizedHead:
    """Calibrated int8 kernels + scales for hr_conv0's x-part.

    Array leaves travel through jit as pytree children; the split geometry
    (k, cm, cr) is static metadata so the serving program specialises on it.
    """

    s_in: jax.Array                    # (ci,) activation scales
    wq_main: jax.Array                 # (kx,ky,kz,ci,cm) int8
    s_main: jax.Array                  # (cm,)
    wq_rem: Optional[jax.Array]        # (1,1,kz,ci,kx*ky*cr) int8 | None
    s_rem: Optional[jax.Array]         # (kx*ky*cr,) | None
    k: Tuple[int, int, int] = dataclasses.field(
        metadata={"static": True}, default=(1, 1, 1)
    )
    cm: int = dataclasses.field(metadata={"static": True}, default=0)
    cr: int = dataclasses.field(metadata={"static": True}, default=0)


def fold_quantize_kernel(kernel, s_in):
    """Per-output-channel int8 quantization of ``kernel * s_in[c_in]``.

    kernel: (kx, ky, kz, ci, co) float; s_in: (ci,) per-input-channel
    activation scales (x is divided by s_in before the conv, so folding
    multiplies the kernel's c_in axis by s_in — exact reassociation).
    Returns (kernel_q int8, s_out (co,) float32).
    """
    wf = kernel.astype(jnp.float32) * s_in[None, None, None, :, None]
    amax = jnp.max(jnp.abs(wf), axis=(0, 1, 2, 3))
    s_out = jnp.maximum(amax, 1e-30) / 127.0
    wq = jnp.clip(jnp.round(wf / s_out), -127, 127).astype(jnp.int8)
    return wq, s_out.astype(jnp.float32)


def quantize_act(x, s_in):
    """x / s_in[c] rounded into int8 (the scales come from calibration)."""
    xs = x.astype(jnp.float32) / s_in
    return jnp.clip(jnp.round(xs), -127, 127).astype(jnp.int8)


def conv3d_int8(xq, wq, padding):
    """int8 x int8 -> int32 conv (NDHWC); padding int or (px, py, pz)."""
    if isinstance(padding, int):
        pads = [(padding, padding)] * 3
    else:
        pads = [(p, p) for p in padding]
    return jax.lax.conv_general_dilated(
        xq, wq, window_strides=(1, 1, 1), padding=pads,
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )


def quantize_split_head(kernel, s_in, lane: int = 128) -> QuantizedHead:
    """Quantize hr_conv0's x-part kernel for the output-split serving conv.

    Mirrors ops/tap_conv.py:conv3d_split_out — a full-lane ``cm``-out main
    conv plus a tap-stacked remainder whose kx*ky taps stack onto the lanes
    — but with int8 kernels. Returns the QuantizedHead consumed by
    ``split_head_conv_int8``.
    """
    kx, ky, kz, cin, cout = kernel.shape
    cm = (cout // lane) * lane
    s_in = jnp.asarray(s_in, jnp.float32).reshape(cin)
    if cm == 0 or cm == cout:
        wq, s_out = fold_quantize_kernel(kernel, s_in)
        return QuantizedHead(
            s_in=s_in, wq_main=wq, s_main=s_out, wq_rem=None, s_rem=None,
            k=(kx, ky, kz), cm=int(cout), cr=0,
        )
    wq, s_out = fold_quantize_kernel(kernel[..., :cm], s_in)
    # remainder as the z-only stacked kernel (tap_stacked_conv3d layout):
    # (kx,ky,kz,ci,cr) -> (1,1,kz,ci, kx*ky*cr), quantized per STACKED
    # channel (each tap's partial products are dequantized before the
    # f32 shifted-tap summation, so per-tap scales are exact)
    rem = kernel[..., cm:]
    cr = cout - cm
    kstack = jnp.transpose(rem, (2, 3, 0, 1, 4)).reshape(
        1, 1, kz, cin, kx * ky * cr
    )
    wq_r, s_r = fold_quantize_kernel(kstack, s_in)
    return QuantizedHead(
        s_in=s_in, wq_main=wq, s_main=s_out, wq_rem=wq_r, s_rem=s_r,
        k=(kx, ky, kz), cm=int(cm), cr=int(cr),
    )


def split_head_conv_int8(x, qh: QuantizedHead, padding: int,
                         out_dtype=jnp.bfloat16):
    """int8 serving version of ops/tap_conv.py:conv3d_split_out.

    Same math as ``conv_general_dilated(x, kernel, SAME)`` up to the int8
    rounding: full-lane int8 main conv + int8 tap-stacked remainder,
    both dequantized per output channel in the epilogue.
    """
    kx, ky, kz = qh.k
    xq = quantize_act(x, qh.s_in)
    main = conv3d_int8(xq, qh.wq_main, padding)
    main = (main.astype(jnp.float32) * qh.s_main).astype(out_dtype)
    if qh.wq_rem is None:
        return main

    X, Y = x.shape[1], x.shape[2]
    cr = qh.cr
    partial = conv3d_int8(xq, qh.wq_rem, (0, 0, padding))
    partial = partial.astype(jnp.float32) * qh.s_rem
    ppad = jnp.pad(
        partial, ((0, 0), (padding, padding), (padding, padding),
                  (0, 0), (0, 0))
    )
    rem = jnp.zeros(
        x.shape[:1] + (X, Y, partial.shape[3], cr), jnp.float32
    )
    for ix in range(kx):
        for iy in range(ky):
            t0 = (ix * ky + iy) * cr
            rem = rem + ppad[:, ix: ix + X, iy: iy + Y, :, t0: t0 + cr]
    return jnp.concatenate([main, rem.astype(out_dtype)], axis=-1)


def head_input_amax(x):
    """Per-channel abs-max over one calibration batch; the caller folds
    batches together host-side (np.maximum over chunks)."""
    return jnp.max(
        jnp.abs(x.astype(jnp.float32)), axis=tuple(range(x.ndim - 1))
    )


def scales_from_amax(amax):
    """Symmetric int8 activation scales from calibrated per-channel amax."""
    return (jnp.maximum(jnp.asarray(amax, jnp.float32), 1e-30) / 127.0)
