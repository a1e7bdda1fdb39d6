"""Pallas HR-head kernel parity vs the XLA head (ops/pallas/hr_head.py).

Reference op: Generator_3D_Resnet_ESRGAN.py:183-222 (hr_conv0 + lrelu +
Dropout3d). Forward and custom-VJP gradients are checked against the plain
XLA conv head in float32, interpret mode (no TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.ops.pallas.hr_head import (
    HeadMeta,
    _head_forward,
    head_fusable,
    hr_head,
    pick_chunk,
)

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _ref_head(Wx, Wt, x, t, dmask, k, slope):
    hp = (k - 1) // 2

    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w, window_strides=(1, 1, 1), padding=[(hp, hp)] * 3,
            dimension_numbers=_DN,
        )

    h = jax.nn.leaky_relu(conv(x, Wx) + conv(t, Wt), negative_slope=slope)
    if dmask is not None:
        h = h * dmask[:, None, None, None, :]
    return h


def _rand_case(rng, N=2, X=8, Y=8, Z=4, nf=16, tc=4, k=3, C=24):
    Wx = jnp.asarray(rng.standard_normal((k, k, k, nf, C)), jnp.float32) * 0.2
    Wt = jnp.asarray(rng.standard_normal((k, k, k, tc, C)), jnp.float32) * 0.2
    x = jnp.asarray(rng.standard_normal((N, X, Y, Z, nf)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((N, X, Y, Z, tc)), jnp.float32)
    return Wx, Wt, x, t


@pytest.mark.parametrize("k,cm", [(3, 16), (3, 24), (5, 8)])
def test_forward_parity(rng, k, cm):
    Wx, Wt, x, t = _rand_case(rng, k=k)
    meta = HeadMeta(k=k, negative_slope=0.2, cm=cm, interpret=True)
    h_main, h_rem = _head_forward(meta, Wx, Wt, x, t, None)
    ref = _ref_head(Wx, Wt, x, t, None, k, 0.2)
    np.testing.assert_allclose(
        np.asarray(h_main), np.asarray(ref[..., :cm]), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_rem), np.asarray(ref[..., cm:]), atol=2e-5, rtol=1e-5
    )


def test_forward_with_dropout_mask(rng):
    Wx, Wt, x, t = _rand_case(rng)
    N, C = x.shape[0], Wx.shape[-1]
    keep = rng.random((N, C)) > 0.3
    dmask = jnp.asarray(keep / 0.7, jnp.float32)
    meta = HeadMeta(k=3, negative_slope=0.2, cm=16, interpret=True)
    h_main, h_rem = hr_head(meta, Wx, Wt, x, t, dmask)
    ref = _ref_head(Wx, Wt, x, t, dmask, 3, 0.2)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([h_main, h_rem], -1)), np.asarray(ref),
        atol=2e-5, rtol=1e-5,
    )


def test_gradients_match_autodiff(rng):
    Wx, Wt, x, t = _rand_case(rng)
    meta = HeadMeta(k=3, negative_slope=0.2, cm=16, interpret=True)
    cot = jnp.asarray(
        rng.standard_normal((2, 8, 8, 4, 24)), jnp.float32
    )

    def loss_fused(Wx, Wt, x, t):
        h_main, h_rem = hr_head(meta, Wx, Wt, x, t, None)
        return jnp.sum(jnp.concatenate([h_main, h_rem], -1) * cot)

    def loss_ref(Wx, Wt, x, t):
        return jnp.sum(_ref_head(Wx, Wt, x, t, None, 3, 0.2) * cot)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(Wx, Wt, x, t)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(Wx, Wt, x, t)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=2e-4
        )


def test_gradients_with_dropout_mask(rng):
    Wx, Wt, x, t = _rand_case(rng)
    N, C = x.shape[0], Wx.shape[-1]
    dmask = jnp.asarray((rng.random((N, C)) > 0.5) / 0.5, jnp.float32)
    meta = HeadMeta(k=3, negative_slope=0.2, cm=16, interpret=True)
    cot = jnp.asarray(rng.standard_normal((2, 8, 8, 4, 24)), jnp.float32)

    def loss(fn):
        def f(Wx, Wt, x, t):
            if fn == "fused":
                hm, hr = hr_head(meta, Wx, Wt, x, t, dmask)
                h = jnp.concatenate([hm, hr], -1)
            else:
                h = _ref_head(Wx, Wt, x, t, dmask, 3, 0.2)
            return jnp.sum(h * cot)
        return f

    g_f = jax.grad(loss("fused"), argnums=(0, 1, 2, 3))(Wx, Wt, x, t)
    g_r = jax.grad(loss("ref"), argnums=(0, 1, 2, 3))(Wx, Wt, x, t)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=2e-4
        )


class TestGeneratorIntegration:
    """pallas_head=True through the fused generator paths (interpret)."""

    def _gen(self, pallas_head, **kw):
        from gan_sr_wind_field_tpu.models import Generator3D

        defaults = dict(
            in_channels=4, out_channels=3, num_features=8, num_rrdb=2,
            upscale=4, hr_kern_size=3, num_rdb_convs=3,
            rdb_growth_channels=4, lff_kern_size=1, terrain_features=4,
            dropout_probability=0.0, init_scale=0.1, dtype=None,
            pallas_head=pallas_head,
        )
        defaults.update(kw)
        return Generator3D(**defaults)

    def _setup(self, G, lr_shape=(2, 4, 3, 5, 4), hr_spatial=(16, 12, 5)):
        k = jax.random.key(0)
        lr = jax.random.normal(jax.random.fold_in(k, 1), lr_shape)
        z = jax.random.normal(
            jax.random.fold_in(k, 2), (lr_shape[0],) + hr_spatial + (1,)
        )
        params = G.init(jax.random.fold_in(k, 3), lr, z, train=False)[
            "params"
        ]
        return params, lr, z

    def test_generate_fused_matches_flax(self):
        from gan_sr_wind_field_tpu.models.fused_apply import generate_fused

        G = self._gen(True)
        params, lr, z = self._setup(G)
        got = generate_fused(G, params, lr, z, interpret=True)
        ref = G.apply({"params": params}, lr, z, train=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
        )

    def test_trainable_grads_match_flax(self):
        from gan_sr_wind_field_tpu.models.fused_train import apply_trainable

        G = self._gen(True)
        params, lr, z = self._setup(G)
        tgt = jax.random.normal(jax.random.key(7), (2, 16, 12, 5, 3))

        def loss_flax(p):
            out = G.apply({"params": p}, lr, z, train=False)
            return jnp.mean((out - tgt) ** 2)

        def loss_fused(p):
            out = apply_trainable(G, p, lr, z, train=False, interpret=True)
            return jnp.mean((out - tgt) ** 2)

        v_ref, g_ref = jax.value_and_grad(loss_flax)(params)
        v_got, g_got = jax.value_and_grad(loss_fused)(params)
        np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
        for (kp, ref), (_, got) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_got),
        ):
            scale = max(1e-8, float(jnp.abs(ref).max()))
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4,
                atol=2e-5 * scale, err_msg=jax.tree_util.keystr(kp),
            )

    def test_dropout_trajectory_matches_xla_path(self):
        """Same dropout key → identical masks on pallas-head vs XLA fused
        paths (training transparency)."""
        from gan_sr_wind_field_tpu.models.fused_train import apply_trainable

        Gp = self._gen(True, dropout_probability=0.4)
        Gx = self._gen(False, dropout_probability=0.4)
        params, lr, z = self._setup(Gp)
        key = jax.random.key(11)
        a = apply_trainable(Gp, params, lr, z, train=True,
                            dropout_key=key, interpret=True)
        b = apply_trainable(Gx, params, lr, z, train=True,
                            dropout_key=key, interpret=True)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5
        )


def test_fusable_gate():
    # bench geometry: HR 64×64×10, nf=128, C=144, k=5
    assert head_fusable((32, 64, 64, 10, 128), 5, 144)
    assert pick_chunk(64, 5, 640) == 8
    # odd row counts / thin channels fall back to XLA
    assert not head_fusable((32, 64, 63, 9, 128), 5, 144)   # YZ % 8 != 0
    assert not head_fusable((32, 64, 64, 10, 64), 5, 144)   # nf % 128
    assert not head_fusable((32, 64, 64, 10, 128), 5, 96)   # C < 128


def test_pick_chunk_edge_cases(monkeypatch):
    # k=1 (hp=0): must not divide by zero; any divisor of X is legal
    assert pick_chunk(64, 1, 640) in {c for c in range(1, 65) if 64 % c == 0}
    # prime X with k=5: only X itself is >= 2*hp and divides X
    assert pick_chunk(13, 5, 640) == 13
    # X smaller than the 2*hp accumulator shift: unchunkable
    assert pick_chunk(3, 5, 640) is None
    # malformed env override is ignored, not a crash
    monkeypatch.setenv("WINDSR_HEAD_CX", "auto")
    assert pick_chunk(64, 5, 640) == 8
    monkeypatch.setenv("WINDSR_HEAD_CX", "16")
    assert pick_chunk(64, 5, 640) == 16


def test_bwd_requires_positive_slope():
    meta = HeadMeta(k=3, negative_slope=0.0, cm=16, interpret=True)
    with pytest.raises(ValueError, match="negative_slope"):
        hr_head(meta, jnp.zeros((3, 3, 3, 8, 16)), jnp.zeros((3, 3, 3, 4, 16)),
                jnp.zeros((1, 4, 4, 4, 8)), jnp.zeros((1, 4, 4, 4, 4)), None)


def test_nograd_flag_parity():
    """`use_pallas_head_nograd` routes ONLY the no-grad forward through the
    head kernel; outputs match the default path exactly (interpret mode)."""
    import sys

    sys.path.insert(0, "tests")
    from test_train_step import make_batch, tiny_cfg

    from gan_sr_wind_field_tpu.train.gan import WindFieldGAN

    rng = np.random.default_rng(3)
    x = np.arange(16, dtype=np.float32) * 150
    lr, hr, z = make_batch(rng)
    outs = []
    for flag in (False, True):
        cfg = tiny_cfg()
        cfg.use_fused_trunk = True
        cfg.use_pallas_head_nograd = flag
        gan = WindFieldGAN(cfg, x, x)
        assert gan._G_nograd.pallas_head is flag
        assert gan.G.pallas_head is False  # train path untouched
        state = gan.init_state(
            jax.random.key(0), (2, 4, 4, 4, 4), (2, 16, 16, 4, 3)
        )
        outs.append(np.asarray(gan.generate(state.params_G, lr, z)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)
