"""Torch-checkpoint import tests.

Oracle: tiny *torch replicas* of the reference generator/discriminator
(independently constructed here following the reference architecture,
Generator_3D_Resnet_ESRGAN.py:183-229 / Discriminator_3D.py:52-193) produce
state_dicts with the reference key layout; importing them into the flax
models must reproduce the torch forward pass.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from gan_sr_wind_field_tpu.models import Discriminator3D, Generator3D
from gan_sr_wind_field_tpu.utils.torch_import import (
    convert_conv_weight,
    import_discriminator_state_dict,
    import_generator_state_dict,
    load_reference_checkpoint,
)

NF, TNF, GC, NCONVS = 8, 4, 4, 3


def conv_seq(cin, cout, k=3, stride=1, pad=1, norm=False, lrelu=True,
             bias=False):
    layers = [nn.Conv3d(cin, cout, k, stride, pad, bias=bias)]
    if norm:
        layers.append(nn.BatchNorm3d(cout))
    if lrelu:
        layers.append(nn.LeakyReLU(0.2))
    return nn.Sequential(*layers)


class TRDBConv(nn.Module):
    def __init__(self, cin, gc):
        super().__init__()
        self.conv = conv_seq(cin, gc, 3)

    def forward(self, x):
        return torch.cat((x, self.conv(x)), 1)


class TRDB(nn.Module):
    def __init__(self, cin, gc, nconvs):
        super().__init__()
        self.n = nconvs - 1
        for i in range(self.n):
            self.add_module(f"conv{i}", TRDBConv(cin + i * gc, gc))
        self.LFF = nn.Conv3d(cin + self.n * gc, cin, 1, padding=0)

    def forward(self, x):
        h = x
        for i in range(self.n):
            h = getattr(self, f"conv{i}")(h)
        return self.LFF(h) * 0.2 + x


class TRRDB(nn.Module):
    def __init__(self, cin, gc, nconvs):
        super().__init__()
        self.RDBs = nn.Sequential(*[TRDB(cin, gc, nconvs) for _ in range(3)])

    def forward(self, x):
        return self.RDBs(x) * 0.2 + x


class TSkip(nn.Module):
    def __init__(self, sub):
        super().__init__()
        self.module = sub

    def forward(self, x):
        return x + self.module(x)


class TorchG(nn.Module):
    """Reference-layout tiny generator (1 RRDB, scale 4)."""

    def __init__(self, in_ch=4):
        super().__init__()
        up = lambda: nn.Sequential(
            nn.Upsample(scale_factor=(2, 2, 1), mode="nearest"),
            conv_seq(NF, NF, 3),
        )
        self.model = nn.Sequential(
            conv_seq(in_ch, NF, 3, lrelu=False),
            TSkip(nn.Sequential(TRRDB(NF, GC, NCONVS),
                                conv_seq(NF, NF, 3, lrelu=False))),
            up(), up(),
        )
        self.terrain_convs = nn.Sequential(
            conv_seq(1, TNF, 3, lrelu=True),
            conv_seq(TNF, TNF, 3, lrelu=False),
        )
        self.hr_convs = nn.Sequential(
            conv_seq(NF + TNF, NF + TNF, 3),
            nn.Dropout3d(0.0),
            nn.Conv3d(NF + TNF, 3, 3, padding=1),
        )

    def forward(self, x, Z):
        x = self.model(x)
        Z = self.terrain_convs(Z)
        return self.hr_convs(torch.cat((x, Z), 1))


class TorchD(nn.Module):
    """Reference-layout tiny discriminator (no slicing, z=4, base=4)."""

    def __init__(self, base=4):
        super().__init__()
        blk = lambda cin, cout, dropn, zstride: nn.Sequential(
            conv_seq(cin, cout, 3, 1, 1, norm=not dropn),
            conv_seq(cout, cout, (4, 4, 3), (2, 2, zstride), 1, norm=True),
        )
        self.features = nn.Sequential(
            blk(3, base, True, 1),
            blk(base, base * 2, False, 1),
            blk(base * 2, base * 4, False, 1),
            blk(base * 4, base * 8, False, 1),
            blk(base * 8, base * 8, False, 2),
        )
        # sized for 64×64×4 inputs: 5 x,y-halvings → 2×2, z → 2
        self.classifier = nn.Sequential(
            nn.Linear(base * 8 * 2 * 2 * 2, 100),
            nn.LeakyReLU(0.2),
            nn.Linear(100, 1),
        )

    def forward(self, x):
        x = self.features(x)
        return self.classifier(x.reshape(x.shape[0], -1))


def _flax_g(split):
    return Generator3D(
        in_channels=4, out_channels=3, num_features=NF, num_rrdb=1,
        upscale=4, hr_kern_size=3, num_rdb_convs=NCONVS,
        rdb_growth_channels=GC, terrain_features=TNF,
        dropout_probability=0.0, split_hr_concat=split, remat=False,
    )


def test_conv_weight_parity(rng):
    """Single conv: torch vs flax with the converted kernel."""
    w = rng.standard_normal((6, 5, 3, 3, 3)).astype(np.float32)
    x = rng.standard_normal((1, 5, 8, 8, 4)).astype(np.float32)  # (N,C,X,Y,Z)
    tout = torch.nn.functional.conv3d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1
    ).numpy()
    kern = convert_conv_weight(w)
    fout = jax.lax.conv_general_dilated(
        jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(kern),
        window_strides=(1, 1, 1), padding=((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(fout), -1, 1), tout, rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("split", [True, False])
def test_generator_import_forward_parity(rng, split):
    tg = TorchG().eval()
    lr = rng.standard_normal((1, 4, 4, 4, 4)).astype(np.float32)
    zt = rng.standard_normal((1, 16, 16, 4, 1)).astype(np.float32)
    with torch.no_grad():
        tout = tg(
            torch.from_numpy(np.moveaxis(lr, -1, 1)),
            torch.from_numpy(np.moveaxis(zt, -1, 1)),
        ).numpy()

    fg = _flax_g(split)
    params = import_generator_state_dict(tg.state_dict(), fg)
    # imported tree must match the init tree structure exactly
    ref = fg.init(jax.random.key(0), jnp.asarray(lr), jnp.asarray(zt),
                  train=False)["params"]
    assert jax.tree_util.tree_structure(ref) == jax.tree_util.tree_structure(
        jax.tree.map(jnp.asarray, params)
    )
    fout = fg.apply({"params": params}, jnp.asarray(lr), jnp.asarray(zt),
                    train=False)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(fout), -1, 1), tout, rtol=2e-4, atol=1e-4
    )


def test_discriminator_import_forward_parity(rng):
    td = TorchD()
    # exercise non-trivial BN running stats before eval
    with torch.no_grad():
        for _ in range(3):
            td(torch.from_numpy(
                rng.standard_normal((2, 3, 64, 64, 4)).astype(np.float32)
            ))
    td = td.eval()
    x = rng.standard_normal((1, 3, 64, 64, 4)).astype(np.float32)
    with torch.no_grad():
        tout = td(torch.from_numpy(x)).numpy()

    fd = Discriminator3D(
        in_channels=3, base_features=4, number_of_z_layers=4,
        enable_slicing=False, dropout_probability=0.0,
    )
    params, stats = import_discriminator_state_dict(td.state_dict(), fd)
    fout = fd.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.moveaxis(x, 1, -1)), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(fout), tout[:, 0], rtol=2e-4, atol=1e-4
    )


def test_load_reference_checkpoint_files(tmp_path, rng):
    tg = TorchG()
    g_path = str(tmp_path / "G_100.pth")
    torch.save(tg.state_dict(), g_path)
    fg = _flax_g(True)
    params_G, params_D, stats_D = load_reference_checkpoint(fg, g_path)
    assert params_D is None and stats_D is None
    assert params_G["hr_conv1"]["kernel"].shape == (3, 3, 3, NF + TNF, 3)


def test_export_roundtrip_and_torch_load(tmp_path, rng):
    """flax → .pth → torch replica forward == flax forward (two-way interop)."""
    from gan_sr_wind_field_tpu.utils.torch_import import (
        export_generator_state_dict,
        save_reference_checkpoint,
    )

    fg = _flax_g(True)
    lr = rng.standard_normal((1, 4, 4, 4, 4)).astype(np.float32)
    zt = rng.standard_normal((1, 16, 16, 4, 1)).astype(np.float32)
    params = fg.init(jax.random.key(3), jnp.asarray(lr), jnp.asarray(zt),
                     train=False)["params"]
    fout = np.asarray(
        fg.apply({"params": params}, jnp.asarray(lr), jnp.asarray(zt),
                 train=False)
    )

    # import(export(params)) is the identity on every leaf
    back = import_generator_state_dict(
        export_generator_state_dict(params, fg), fg
    )
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params),
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(
            jax.tree.map(jnp.asarray, back)), key=lambda t: str(t[0])),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the torch replica loads the exported file and reproduces the forward
    path = save_reference_checkpoint(str(tmp_path / "G_7.pth"), params, fg)
    tg = TorchG()
    tg.load_state_dict(torch.load(path))
    tg = tg.eval()
    with torch.no_grad():
        tout = tg(
            torch.from_numpy(np.moveaxis(lr, -1, 1)),
            torch.from_numpy(np.moveaxis(zt, -1, 1)),
        ).numpy()
    np.testing.assert_allclose(
        np.moveaxis(fout, -1, 1), tout, rtol=2e-4, atol=1e-4
    )


def test_serve_from_torch_checkpoint(tmp_path, rng):
    """End-to-end migration: WindFieldSR straight off a reference .pth."""
    from gan_sr_wind_field_tpu.eval.serve import WindFieldSR
    from test_train_step import tiny_cfg

    cfg = tiny_cfg()
    cfg.generator.num_RDB_convs = NCONVS
    cfg.generator.dropout_probability = 0.0

    tg = TorchG().eval()
    g_path = str(tmp_path / "G_42.pth")
    torch.save(tg.state_dict(), g_path)

    x = np.arange(16, dtype=np.float32) * 150
    sr = WindFieldSR.from_checkpoint(cfg, g_path, x, x)
    lr = rng.standard_normal((4, 4, 4, 4)).astype(np.float32)
    zt = rng.standard_normal((16, 16, 4, 1)).astype(np.float32)
    out = sr.upscale(lr, zt)
    with torch.no_grad():
        tout = tg(
            torch.from_numpy(np.moveaxis(lr[None], -1, 1)),
            torch.from_numpy(np.moveaxis(zt[None], -1, 1)),
        ).numpy()[0]
    np.testing.assert_allclose(
        np.moveaxis(out, -1, 0), tout, rtol=2e-4, atol=1e-4
    )
