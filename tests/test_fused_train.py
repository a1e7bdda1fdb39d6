"""Trainable fused-trunk path: gradients vs the flax autodiff oracle.

The custom VJP's hand-written backward (lax.scan over RDBs with
linear-transposed convs) must reproduce jax.grad of Generator3D.apply
exactly (float32) — values AND every parameter cotangent.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gan_sr_wind_field_tpu.models import Generator3D
from gan_sr_wind_field_tpu.models.fused_train import apply_trainable


def _tiny_gen(**kw):
    defaults = dict(
        in_channels=4, out_channels=3, num_features=8, num_rrdb=2,
        upscale=4, hr_kern_size=3, num_rdb_convs=3, rdb_growth_channels=4,
        lff_kern_size=1, terrain_features=4, dropout_probability=0.0,
        init_scale=0.1, dtype=None,
    )
    defaults.update(kw)
    return Generator3D(**defaults)


def _setup(G, lr_shape, hr_spatial, seed=0):
    k = jax.random.key(seed)
    lr = jax.random.normal(jax.random.fold_in(k, 1), lr_shape, jnp.float32)
    z = jax.random.normal(
        jax.random.fold_in(k, 2), (lr_shape[0],) + hr_spatial + (1,),
        jnp.float32,
    )
    tgt = jax.random.normal(
        jax.random.fold_in(k, 4), (lr_shape[0],) + hr_spatial + (3,),
        jnp.float32,
    )
    params = G.init(jax.random.fold_in(k, 3), lr, z, train=False)["params"]
    return params, lr, z, tgt


def test_grads_match_flax_autodiff():
    G = _tiny_gen()
    params, lr, z, tgt = _setup(G, (2, 4, 3, 5, 4), (16, 12, 5))

    def loss_flax(p):
        out = G.apply({"params": p}, lr, z, train=False)
        return jnp.mean((out - tgt) ** 2)

    def loss_fused(p):
        out = apply_trainable(G, p, lr, z, train=False, interpret=True)
        return jnp.mean((out - tgt) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_flax)(params)
    v_got, g_got = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-6)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_got = {jax.tree_util.keystr(kp): v
                for kp, v in jax.tree_util.tree_leaves_with_path(g_got)}
    assert len(flat_ref) == len(flat_got)
    for kp, ref in flat_ref:
        key = jax.tree_util.keystr(kp)
        scale = max(1e-8, float(jnp.abs(ref).max()))
        np.testing.assert_allclose(
            np.asarray(flat_got[key]), np.asarray(ref),
            rtol=2e-4, atol=2e-5 * scale, err_msg=key,
        )


def test_grads_match_five_conv_rdb():
    G = _tiny_gen(num_rdb_convs=5, num_rrdb=1)
    params, lr, z, tgt = _setup(G, (1, 4, 4, 5, 4), (16, 16, 5), seed=9)

    def loss(fn):
        def f(p):
            out = fn(p)
            return jnp.sum(out * tgt)  # non-symmetric functional
        return f

    g_ref = jax.grad(
        loss(lambda p: G.apply({"params": p}, lr, z, train=False))
    )(params)
    g_got = jax.grad(
        loss(lambda p: apply_trainable(G, p, lr, z, train=False,
                                       interpret=True))
    )(params)
    for (kp, ref), (_, got) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_got),
    ):
        scale = max(1e-8, float(jnp.abs(ref).max()))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4,
            atol=2e-5 * scale, err_msg=jax.tree_util.keystr(kp),
        )


def test_dropout_masks_channels_and_is_keyed():
    G = _tiny_gen(dropout_probability=0.5)
    params, lr, z, _ = _setup(G, (1, 4, 4, 5, 4), (16, 16, 5), seed=2)
    k1, k2 = jax.random.key(10), jax.random.key(11)
    o1 = apply_trainable(G, params, lr, z, train=True, dropout_key=k1,
                         interpret=True)
    o1b = apply_trainable(G, params, lr, z, train=True, dropout_key=k1,
                          interpret=True)
    o2 = apply_trainable(G, params, lr, z, train=True, dropout_key=k2,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o1b))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # eval ignores dropout
    oe = apply_trainable(G, params, lr, z, train=False, interpret=True)
    ref = G.apply({"params": params}, lr, z, train=False)
    np.testing.assert_allclose(np.asarray(oe), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
