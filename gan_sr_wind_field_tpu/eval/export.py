"""Ahead-of-time generator export — a self-contained deployment artifact.

`export_generator` serializes the trained generator's eval-mode forward
(weights baked in as StableHLO constants) via `jax.export`, producing ONE
file that deserializes and runs with **no model code, config, or checkpoint
infrastructure** — only jax itself.  The batch dimension is exported
symbolically by default, so a single artifact serves any batch size, and
the module is lowered for both CPU and TPU when cross-platform lowering is
available.

The reference has no deployment format at all: its inference path
re-instantiates the torch model from config and loops single samples
through ``test.py:106-121``.  This module is the TPU-native production
counterpart: export once next to the run folder, then serve anywhere with

    from gan_sr_wind_field_tpu.eval.export import load_exported
    sr = load_exported("generator.wsrx")
    hr = sr.upscale(lr, z_terrain)          # (b, X·s, Y·s, zl, 3)

The export always uses the pure-XLA flax forward (including the
`split_hr_out` no-grad reassociation when configured) — never the Pallas
trunk kernels, whose Mosaic custom calls would pin the artifact to one
TPU toolchain generation.

File layout: ``b"WSRX" | u32 header_len | header JSON (utf-8) | payload``
where payload is `jax.export.Exported.serialize()` bytes and the header
records shapes/scale/platform metadata (see `export_generator`).
"""

from __future__ import annotations

import json
import struct
from typing import Optional, Sequence, Tuple

import numpy as np

from gan_sr_wind_field_tpu.data.transform import lr_channel_names

_MAGIC = b"WSRX"
_FORMAT_VERSION = 1


def export_generator(
    gan,
    params_G,
    path: str,
    lr_size: Optional[Tuple[int, int]] = None,
    batch_polymorphic: bool = True,
    platforms: Sequence[str] = ("cpu", "tpu"),
    norm_stats=None,
) -> dict:
    """Serialize ``gan``'s generator with ``params_G`` baked in.

    lr_size: horizontal LR extent (X, Y); defaults to the config's patch
    geometry (slice_size when slicing is enabled).  Returns the header
    metadata dict that was written.

    norm_stats: the training cache's `NormStats` (or dict) — baked into
    the header so artifact consumers can map the model's NORMALIZED-space
    i/o back to physical units (wind · uvw_max, data/transform.py).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    cfg = gan.cfg
    g = cfg.gan_config
    s = cfg.scale
    zl = g.number_of_z_layers
    cin = cfg.lr_num_channels
    if lr_size is None:
        patch = g.slice_size if g.enable_slicing else len(gan.x)
        lr_size = (patch // s, patch // s)
    X, Y = lr_size

    # bake weights as constants: the artifact must be loadable without the
    # checkpoint machinery.  Cast to the model's param dtype layout as-is.
    params_const = jax.tree.map(jnp.asarray, jax.device_get(params_G))
    model = gan._G_nograd  # pure-XLA path incl. no-grad overrides

    def fn(lr, z_terrain):
        return model.apply(
            {"params": params_const}, lr, z_terrain, train=False
        )

    if batch_polymorphic:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = 1
    lr_aval = jax.ShapeDtypeStruct((b, X, Y, zl, cin), jnp.float32)
    z_aval = jax.ShapeDtypeStruct((b, X * s, Y * s, zl, 1), jnp.float32)

    exported = None
    used_platforms = tuple(platforms)
    try:
        exported = jexport.export(jax.jit(fn), platforms=used_platforms)(
            lr_aval, z_aval
        )
    except Exception as first_err:
        # cross-platform lowering unavailable (e.g. experimental PJRT
        # backends): fall back to the current platform only.  The axon
        # tunnel backend IS a TPU (same convention as train/gan.py).
        backend = jax.default_backend()
        used_platforms = ("tpu",) if backend == "axon" else (backend,)
        try:
            exported = jexport.export(
                jax.jit(fn), platforms=used_platforms
            )(lr_aval, z_aval)
        except Exception:
            # the fallback failing too usually means the FIRST error was
            # a genuine export bug, not a platform issue — surface it
            raise first_err

    header = {
        "format_version": _FORMAT_VERSION,
        "scale": s,
        "lr_shape": ["b" if batch_polymorphic else 1, X, Y, zl, cin],
        "z_shape": [
            "b" if batch_polymorphic else 1, X * s, Y * s, zl, 1,
        ],
        "out_channels": 3,
        "batch_polymorphic": bool(batch_polymorphic),
        "platforms": list(used_platforms),
        "jax_version": jax.__version__,
        # LR channel layout by name — makes the artifact self-describing
        # (physical-units serving needs to know which channels to build)
        "lr_channels": lr_channel_names(
            g.include_pressure, g.include_z_channel,
            g.include_above_ground_channel,
        ),
    }
    if norm_stats is not None:
        import dataclasses

        header["norm_stats"] = (
            dataclasses.asdict(norm_stats)
            if dataclasses.is_dataclass(norm_stats) else dict(norm_stats)
        )
    hdr = json.dumps(header).encode("utf-8")
    payload = exported.serialize()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(payload)
    return header


class ExportedSR:
    """Loaded artifact: `.upscale(lr, z_terrain)` mirrors
    `WindFieldSR.upscale` (unbatched (X,Y,zl,C) inputs are batched and
    squeezed back)."""

    def __init__(self, exported, header: dict):
        self._exported = exported
        self.header = header
        self.scale = header["scale"]
        self.norm_stats = header.get("norm_stats")  # physical-unit factors
        self.lr_channels = header.get("lr_channels")  # LR layout by name

    def upscale(self, lr, z_terrain):
        squeeze = np.ndim(lr) == 4
        if squeeze:
            lr, z_terrain = lr[None], z_terrain[None]
        lr = np.asarray(lr, np.float32)
        z_terrain = np.asarray(z_terrain, np.float32)
        if not self.header["batch_polymorphic"]:
            if lr.shape[0] != self.header["lr_shape"][0]:
                raise ValueError(
                    f"artifact was exported with static batch "
                    f"{self.header['lr_shape'][0]}, got {lr.shape[0]}"
                )
        out = np.asarray(self._exported.call(lr, z_terrain))
        return out[0] if squeeze else out

    def upscale_physical(self, lr_uvw, z, pressure=None,
                         z_above_ground=None):
        """Raw m/s wind in, m/s SR wind out — mirrors
        `WindFieldSR.upscale_physical` using the channel layout and
        norm_stats baked into the artifact header."""
        if self.norm_stats is None or "lr_channels" not in self.header:
            raise ValueError(
                "artifact lacks norm_stats/lr_channels (re-export with "
                "norm_stats to enable physical-units serving)"
            )
        from gan_sr_wind_field_tpu.data.transform import (
            _stat,
            physical_to_model_inputs,
        )

        names = self.header["lr_channels"]
        lr, zt = physical_to_model_inputs(
            lr_uvw, z, self.norm_stats, self.scale,
            include_pressure="p" in names,
            include_z_channel=("z" in names or "z_relative" in names),
            include_above_ground_channel="z_above_ground" in names,
            pressure=pressure, z_above_ground=z_above_ground,
        )
        return self.upscale(lr, zt) * _stat(self.norm_stats, "uvw_max")


def read_header(path: str) -> dict:
    """Artifact metadata only (scale, shapes, norm_stats, lr_channels) —
    no jax.export deserialization, so it is cheap and backend-free."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a WSRX artifact (magic {magic!r})")
        (hdr_len,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hdr_len).decode("utf-8"))
    if header["format_version"] > _FORMAT_VERSION:
        raise ValueError(
            f"{path}: format v{header['format_version']} is newer than "
            f"this reader (v{_FORMAT_VERSION})"
        )
    return header


def load_exported(path: str) -> ExportedSR:
    """Deserialize an artifact written by `export_generator`."""
    from jax import export as jexport

    header = read_header(path)
    with open(path, "rb") as f:
        f.seek(4)
        (hdr_len,) = struct.unpack("<I", f.read(4))
        f.seek(8 + hdr_len)
        payload = f.read()
    exported = jexport.deserialize(payload)
    return ExportedSR(exported, header)
