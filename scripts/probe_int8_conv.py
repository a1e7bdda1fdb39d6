#!/usr/bin/env python
"""Does XLA:TPU lower int8 conv_general_dilated to the int8 MXU path?

Times the two conv geometries that dominate the no-grad generator forward
(serving): the HR head conv (144->144 k5^3 at HR res) and the RDB growth
conv (128->32 k3^3 at LR res), in bf16 vs int8(+int32 accum). If int8 runs
~2x bf16, a post-training-quantized serving tier is a real lever; if XLA
upcasts (parity or slower), it is not. One JSON line per case.

Timing: scalar-fence + N-vs-2N differencing (remote tunnel, see bench.py).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import setup_compile_cache  # noqa: E402

_DN = ("NDHWC", "DHWIO", "NDHWC")


def main():
    setup_compile_cache()
    import jax
    import jax.numpy as jnp

    def conv(x, w, pad, acc_dtype):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding=[(pad, pad)] * 3,
            dimension_numbers=_DN, preferred_element_type=acc_dtype,
        )

    cases = [
        # (name, N, X, Y, Z, Cin, Cout, k)
        ("hr_head_144_k5", 32, 64, 64, 10, 144, 144, 5),
        ("growth_128_32_k3", 32, 16, 16, 10, 128, 32, 3),
        ("head_128_k5", 32, 64, 64, 10, 128, 128, 5),
    ]
    rng = np.random.default_rng(0)

    for name, n, xx, yy, zz, ci, co, k in cases:
        for dt, acc in (("bfloat16", jnp.bfloat16), ("int8", jnp.int32)):
            if dt == "bfloat16":
                x = jnp.asarray(
                    rng.standard_normal((n, xx, yy, zz, ci)), jnp.bfloat16
                )
                w = jnp.asarray(
                    rng.standard_normal((k, k, k, ci, co)), jnp.bfloat16
                )
            else:
                x = jnp.asarray(
                    rng.integers(-127, 127, (n, xx, yy, zz, ci)), jnp.int8
                )
                w = jnp.asarray(
                    rng.integers(-127, 127, (k, k, k, ci, co)), jnp.int8
                )
            f = jax.jit(functools.partial(conv, pad=k // 2, acc_dtype=acc))

            def run(m):
                acc_s = jnp.float32(0.0)
                t0 = time.perf_counter()
                for _ in range(m):
                    out = f(x, w)
                    acc_s = acc_s + jnp.sum(
                        out[0, 0, 0, 0, :2].astype(jnp.float32)
                    )
                _ = float(acc_s)
                return time.perf_counter() - t0

            run(2)
            t1 = min(run(4) for _ in range(2))
            t2 = min(run(12) for _ in range(2))
            dt_ms = (t2 - t1) / 8 * 1e3
            flops = 2 * n * xx * yy * zz * ci * co * k ** 3
            print(json.dumps({
                "case": name, "dtype": dt,
                "ms": round(dt_ms, 3),
                "tflops": round(flops / (dt_ms / 1e3) / 1e12, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
