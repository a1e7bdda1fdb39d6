"""hr_conv0 split (conv(x)+conv(t)) must equal conv(concat(x,t)) with the
weights stacked along the input-channel axis."""

import numpy as np

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.models import Generator3D


def _small(split):
    return Generator3D(
        in_channels=4, num_features=8, num_rrdb=1, num_rdb_convs=2,
        rdb_growth_channels=4, upscale=4, hr_kern_size=3,
        terrain_features=4, dropout_probability=0.0, split_hr_concat=split,
    )


def test_split_equals_concat(rng):
    g_split = _small(True)
    g_cat = _small(False)
    lr = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 4)), jnp.float32)
    zt = jnp.asarray(rng.standard_normal((1, 16, 16, 4, 1)), jnp.float32)

    v = g_split.init(jax.random.key(0), lr, zt, train=False)
    p = dict(v["params"])
    # build the concat variant's params: stack the two split kernels
    kx = p.pop("hr_conv0_x")["kernel"]
    kt = p.pop("hr_conv0_t")["kernel"]
    p["hr_conv0"] = {"Conv_0": {"kernel": jnp.concatenate([kx, kt], axis=3)}}

    out_split = g_split.apply(v, lr, zt, train=False)
    out_cat = g_cat.apply({"params": p}, lr, zt, train=False)
    np.testing.assert_allclose(
        np.asarray(out_split), np.asarray(out_cat), rtol=1e-5, atol=1e-6
    )


def test_param_count_unchanged(rng):
    lr = jnp.zeros((1, 4, 4, 4, 4))
    zt = jnp.zeros((1, 16, 16, 4, 1))
    count = lambda g: sum(
        int(np.prod(s.shape))
        for s in jax.tree.leaves(
            jax.eval_shape(lambda k: g.init(k, lr, zt, train=False),
                           jax.random.key(0))["params"]
        )
    )
    assert count(_small(True)) == count(_small(False))
