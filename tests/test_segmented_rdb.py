"""Segmented (concat-free) RDB must be numerically identical to the concat
formulation — convolution is linear in input channels."""

import numpy as np

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.models.blocks import RDB


def test_segmented_matches_concat(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 4, 8)), jnp.float32)
    seg = RDB(growth_channels=4, num_convs=3, lff_kern_size=1, segmented=True)
    con = RDB(growth_channels=4, num_convs=3, lff_kern_size=1, segmented=False)

    v_seg = seg.init(jax.random.key(0), x)
    # transplant segmented params into the concat module's tree
    p = v_seg["params"]
    v_con = {
        "params": {
            "conv0": {"Conv_0": {"kernel": p["conv0_kernel"]}},
            "conv1": {"Conv_0": {"kernel": p["conv1_kernel"]}},
            "LFF": {"kernel": p["LFF_kernel"], "bias": p["LFF_bias"]},
        }
    }
    out_seg = seg.apply(v_seg, x)
    out_con = con.apply(v_con, x)
    np.testing.assert_allclose(
        np.asarray(out_seg), np.asarray(out_con), rtol=1e-5, atol=1e-6
    )


def test_segmented_param_count_equal(rng):
    x = jnp.zeros((1, 4, 4, 4, 8))
    count = lambda m: sum(
        int(np.prod(v.shape))
        for v in jax.tree.leaves(
            jax.eval_shape(lambda k: m.init(k, x), jax.random.key(0))["params"]
        )
    )
    a = count(RDB(growth_channels=4, num_convs=3, segmented=True))
    b = count(RDB(growth_channels=4, num_convs=3, segmented=False))
    assert a == b
