"""Stochastic-rounding bf16 cast + bf16-SR optimizer-state tests."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gan_sr_wind_field_tpu.ops.sr_cast import (
    bf16_sr_optimizer_state,
    stochastic_round_bf16,
    tree_stochastic_round_bf16,
)


def _bf16_neighbors(x):
    """The two bf16 values bracketing each f32 element."""
    down = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )
    up = jax.lax.bitcast_convert_type(
        (jax.lax.bitcast_convert_type(x, jnp.uint32) | jnp.uint32(0xFFFF))
        + jnp.uint32(1),
        jnp.float32,
    )
    return np.asarray(down), np.asarray(up)


def test_sr_values_bracket_and_unbiased(rng):
    x = jnp.asarray(
        rng.standard_normal(2048).astype(np.float32) * 0.01
    )
    outs = np.stack([
        np.asarray(
            stochastic_round_bf16(x, jax.random.key(s)), np.float32
        )
        for s in range(256)
    ])
    down, up = _bf16_neighbors(x)
    # every draw is one of the two bracketing bf16 values
    assert np.all((outs == down[None]) | (outs == up[None]))
    # the mean converges to x (unbiasedness): relative error ≪ the ~0.4%
    # bf16 quantisation step after 256 draws
    rel = np.abs(outs.mean(0) - np.asarray(x)) / np.abs(np.asarray(x))
    assert np.median(rel) < 1e-3

    # exactly-representable values never change
    exact = jnp.asarray([0.0, 1.0, -2.0, 0.5], jnp.float32)
    got = stochastic_round_bf16(exact, jax.random.key(0))
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(exact)
    )


def test_tree_cast_only_f32(rng):
    tree = {
        "a": jnp.ones((4, 4), jnp.float32),
        "b": jnp.ones((3,), jnp.int32),
        "c": jnp.ones((2,), jnp.bfloat16),
    }
    out = tree_stochastic_round_bf16(tree, jax.random.key(0))
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32
    assert out["c"].dtype == jnp.bfloat16


def test_bf16_sr_adam_trains_quadratic():
    """bf16-SR Adam reaches the optimum of a quadratic like f32 Adam."""
    target = jnp.asarray([1.5, -0.25, 3.0], jnp.float32)

    def loss(p):
        return jnp.sum((p - target) ** 2)

    for opt in (
        optax.adam(0.05),
        bf16_sr_optimizer_state(optax.adam(0.05), seed=7),
    ):
        p = jnp.zeros(3, jnp.float32)
        state = opt.init(p)
        for _ in range(400):
            g = jax.grad(loss)(p)
            upd, state = opt.update(g, state, p)
            p = optax.apply_updates(p, upd)
        assert float(loss(p)) < 1e-3

    # the wrapped state's moment leaves really are bf16
    opt = bf16_sr_optimizer_state(optax.adam(0.05), seed=7)
    st = opt.init(jnp.zeros(3, jnp.float32))
    dtypes = {
        l.dtype
        for l in jax.tree.leaves(st.inner)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    }
    assert dtypes == {jnp.dtype(jnp.bfloat16)}


def test_gan_step_with_bf16_sr_state(rng):
    """Full train step with optimizer_state_dtype=bfloat16_sr runs and the
    moments stay bf16 through the donated update."""
    from test_train_step import make_batch, tiny_cfg

    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    cfg = tiny_cfg()
    cfg.training.optimizer_state_dtype = "bfloat16_sr"
    x = np.arange(16, dtype=np.float32) * 150
    gan = WindFieldGAN(cfg, x, x)
    state = gan.init_state(
        jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
    )
    lr, hr, z = make_batch(rng)
    for _ in range(3):
        state, m = gan.train_step(state, lr, hr, z)
    assert np.isfinite(float(m["total"])) or np.isfinite(
        float(m["D_train_loss"])
    )
    dtypes = {
        l.dtype
        for l in jax.tree.leaves(state.opt_state_G.inner)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    }
    assert dtypes == {jnp.dtype(jnp.bfloat16)}
