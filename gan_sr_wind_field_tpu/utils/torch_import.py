"""Import reference PyTorch checkpoints (`G_{it}.pth` / `D_{it}.pth`).

Migration path for users of the reference (GAN_models/baseGAN.py:82-106
saves plain ``state_dict()`` pickles): convert a torch state_dict into this
framework's flax param trees so trained reference weights load directly.

Layout facts (derived from the reference module construction):

- Generator (CNN_models/Generator_3D_Resnet_ESRGAN.py:183-222):
  ``model`` = Sequential(feature_conv, SkipConnectionBlock(RRDBs…lr_conv),
  *upconvs); ``terrain_convs``; ``hr_convs`` = [conv+lrelu, dropout, conv].
  Conv factory wraps each conv in a Sequential (torch_blocks.py:5-37), hence
  the ``.0.weight`` suffixes; RDB growth convs sit at
  ``…RDBs.{j}.conv{k}.conv.0.weight`` and the LFF fusion conv keeps its bias
  (torch_blocks.py:270-278).
- Discriminator (CNN_models/Discriminator_3D.py:52-188): ``features`` =
  5 two-conv blocks (or 4 blocks + 2 head convs under ``enable_slicing``),
  BatchNorm everywhere except the first conv; ``classifier`` =
  Linear→LeakyReLU→Linear.

Weight conventions converted here:

- Conv3d ``(O, I, kx, ky, kz)`` → flax NDHWC kernel ``(kx, ky, kz, I, O)``.
- Linear ``(out, in)`` → flax Dense kernel ``(in, out)``; the first Linear's
  input ordering changes because torch flattens channel-first (c, x, y, z)
  while this framework flattens channel-last (x, y, z, c).
- BatchNorm weight/bias → scale/bias params; running_mean/var → batch_stats.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    """torch.Tensor or array-like → float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def convert_conv_weight(w) -> np.ndarray:
    """torch Conv3d (O, I, kx, ky, kz) → flax (kx, ky, kz, I, O)."""
    return np.transpose(_np(w), (2, 3, 4, 1, 0))


def convert_dense_weight(w) -> np.ndarray:
    """torch Linear (out, in) → flax Dense kernel (in, out)."""
    return np.ascontiguousarray(_np(w).T)


def convert_flatten_dense_weight(w, c: int, z: int) -> np.ndarray:
    """First classifier Linear: reorder the flattened input axis.

    torch flattens D features channel-first → index order (c, x, y, z);
    flax flattens channel-last → (x, y, z, c). ``c``/``z`` are the feature
    count and remaining z layers; x=y is inferred from the weight shape.
    """
    w = _np(w)
    out_f, in_f = w.shape
    xy = in_f // (c * z)
    x = int(round(math.sqrt(xy)))
    if x * x != xy:
        raise ValueError(f"cannot infer square XY extent from {in_f}")
    w = w.reshape(out_f, c, x, x, z).transpose(0, 2, 3, 4, 1)
    return np.ascontiguousarray(w.reshape(out_f, -1).T)


def import_generator_state_dict(
    state_dict: Mapping[str, Any], generator
) -> Dict[str, Any]:
    """Reference ``G_{it}.pth`` state_dict → flax params for `Generator3D`.

    ``generator`` is the target Generator3D module (its static config decides
    layer counts and whether hr_conv0 is stored split).
    """
    sd = state_dict
    g = generator
    if g.conv_mode != "3D":
        raise NotImplementedError("import supports conv_mode='3D' only")
    params: Dict[str, Any] = {}

    def conv_entry(key: str) -> Dict[str, Any]:
        return {"Conv_0": {"kernel": convert_conv_weight(sd[key])}}

    params["feature_conv"] = conv_entry("model.0.0.weight")

    for i in range(g.num_rrdb):
        rrdb: Dict[str, Any] = {}
        for j in range(3):
            base = f"model.1.module.{i}.RDBs.{j}."
            rdb: Dict[str, Any] = {}
            for k in range(g.num_rdb_convs - 1):
                rdb[f"conv{k}"] = {
                    "Conv_0": {
                        "kernel": convert_conv_weight(
                            sd[base + f"conv{k}.conv.0.weight"]
                        )
                    }
                }
            rdb["LFF"] = {
                "kernel": convert_conv_weight(sd[base + "LFF.weight"]),
                "bias": _np(sd[base + "LFF.bias"]),
            }
            rrdb[f"RDB{j}"] = rdb
        params[f"RRDB{i}"] = rrdb

    params["lr_conv"] = conv_entry(f"model.1.module.{g.num_rrdb}.0.weight")

    n_up = int(math.floor(math.log2(g.upscale)))
    for u in range(n_up):
        params[f"upconv{u}"] = conv_entry(f"model.{2 + u}.1.0.weight")

    params["terrain_conv0"] = conv_entry("terrain_convs.0.0.weight")
    params["terrain_conv1"] = conv_entry("terrain_convs.1.0.weight")

    w0 = _np(sd["hr_convs.0.0.weight"])  # (O, nf+tnf, k, k, k)
    if g.split_hr_concat:
        # split the concat conv by input-channel range — identical math
        # (Generator3D.split_hr_concat)
        params["hr_conv0_x"] = {
            "kernel": convert_conv_weight(w0[:, : g.num_features])
        }
        params["hr_conv0_t"] = {
            "kernel": convert_conv_weight(w0[:, g.num_features :])
        }
    else:
        params["hr_conv0"] = {"Conv_0": {"kernel": convert_conv_weight(w0)}}

    params["hr_conv1"] = {
        "kernel": convert_conv_weight(sd["hr_convs.2.weight"]),
        "bias": _np(sd["hr_convs.2.bias"]),
    }
    return params


def _bn_entries(sd: Mapping[str, Any], prefix: str):
    scale_bias = {
        "scale": _np(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
    }
    stats = {
        "mean": _np(sd[prefix + ".running_mean"]),
        "var": _np(sd[prefix + ".running_var"]),
    }
    return scale_bias, stats


def import_discriminator_state_dict(
    state_dict: Mapping[str, Any], discriminator
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference ``D_{it}.pth`` state_dict → (params, batch_stats)."""
    from gan_sr_wind_field_tpu.models.discriminator import remainder_z_layers

    sd = state_dict
    d = discriminator
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    n_blocks = 4 if d.enable_slicing else 5

    for i in range(n_blocks):
        blk_p: Dict[str, Any] = {}
        blk_s: Dict[str, Any] = {}
        conv_p: Dict[str, Any] = {
            "Conv_0": {"kernel": convert_conv_weight(sd[f"features.{i}.0.0.weight"])}
        }
        if i > 0 and d.norm == "batch":  # block 0 drops the first norm
            sb, st = _bn_entries(sd, f"features.{i}.0.1")
            conv_p["BatchNorm_0"] = sb
            blk_s["conv"] = {"BatchNorm_0": st}
        blk_p["conv"] = conv_p
        strided_p: Dict[str, Any] = {
            "Conv_0": {"kernel": convert_conv_weight(sd[f"features.{i}.1.0.weight"])}
        }
        if d.norm == "batch":
            sb, st = _bn_entries(sd, f"features.{i}.1.1")
            strided_p["BatchNorm_0"] = sb
            blk_s["strided_conv"] = {"BatchNorm_0": st}
        blk_p["strided_conv"] = strided_p
        params[f"block{i}"] = blk_p
        if blk_s:
            stats[f"block{i}"] = blk_s

    if d.enable_slicing:
        for hi, fi in (("head_conv0", 4), ("head_conv1", 5)):
            hp: Dict[str, Any] = {
                "Conv_0": {
                    "kernel": convert_conv_weight(sd[f"features.{fi}.0.weight"])
                }
            }
            sb, st = _bn_entries(sd, f"features.{fi}.1")
            hp["BatchNorm_0"] = sb
            params[hi] = hp
            stats[hi] = {"BatchNorm_0": st}

    rem = remainder_z_layers(d.number_of_z_layers)
    params["fc0"] = {
        "kernel": convert_flatten_dense_weight(
            sd["classifier.0.weight"], c=d.base_features * 8, z=rem[5]
        ),
        "bias": _np(sd["classifier.0.bias"]),
    }
    params["fc1"] = {
        "kernel": convert_dense_weight(sd["classifier.2.weight"]),
        "bias": _np(sd["classifier.2.bias"]),
    }
    return params, stats


def _inv_conv_weight(k) -> np.ndarray:
    """flax (kx, ky, kz, I, O) → torch Conv3d (O, I, kx, ky, kz)."""
    return np.ascontiguousarray(np.transpose(_np(k), (4, 3, 0, 1, 2)))


def export_generator_state_dict(params, generator) -> Dict[str, np.ndarray]:
    """Flax Generator3D params → reference-layout state_dict arrays.

    Inverse of `import_generator_state_dict` (wrap values in torch tensors
    and ``torch.save`` to produce a reference-loadable ``G_{it}.pth``).
    """
    g = generator
    sd: Dict[str, np.ndarray] = {}
    sd["model.0.0.weight"] = _inv_conv_weight(
        params["feature_conv"]["Conv_0"]["kernel"]
    )
    for i in range(g.num_rrdb):
        for j in range(3):
            base = f"model.1.module.{i}.RDBs.{j}."
            rdb = params[f"RRDB{i}"][f"RDB{j}"]
            for k in range(g.num_rdb_convs - 1):
                sd[base + f"conv{k}.conv.0.weight"] = _inv_conv_weight(
                    rdb[f"conv{k}"]["Conv_0"]["kernel"]
                )
            sd[base + "LFF.weight"] = _inv_conv_weight(rdb["LFF"]["kernel"])
            sd[base + "LFF.bias"] = _np(rdb["LFF"]["bias"])
    sd[f"model.1.module.{g.num_rrdb}.0.weight"] = _inv_conv_weight(
        params["lr_conv"]["Conv_0"]["kernel"]
    )
    n_up = int(math.floor(math.log2(g.upscale)))
    for u in range(n_up):
        sd[f"model.{2 + u}.1.0.weight"] = _inv_conv_weight(
            params[f"upconv{u}"]["Conv_0"]["kernel"]
        )
    sd["terrain_convs.0.0.weight"] = _inv_conv_weight(
        params["terrain_conv0"]["Conv_0"]["kernel"]
    )
    sd["terrain_convs.1.0.weight"] = _inv_conv_weight(
        params["terrain_conv1"]["Conv_0"]["kernel"]
    )
    if g.split_hr_concat:
        wx = _inv_conv_weight(params["hr_conv0_x"]["kernel"])
        wt = _inv_conv_weight(params["hr_conv0_t"]["kernel"])
        sd["hr_convs.0.0.weight"] = np.concatenate([wx, wt], axis=1)
    else:
        sd["hr_convs.0.0.weight"] = _inv_conv_weight(
            params["hr_conv0"]["Conv_0"]["kernel"]
        )
    sd["hr_convs.2.weight"] = _inv_conv_weight(params["hr_conv1"]["kernel"])
    sd["hr_convs.2.bias"] = _np(params["hr_conv1"]["bias"])
    return sd


def save_reference_checkpoint(path: str, params, generator) -> str:
    """Write a reference-loadable ``G_{it}.pth`` from flax params."""
    import torch

    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in export_generator_state_dict(params, generator).items()
    }
    torch.save(sd, path)
    return path


def _load_state_dict(path):
    """torch.load restricted to plain state_dict tensors; weights_only=True
    avoids unpickling arbitrary objects from third-party .pth files."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # torch too old for the kwarg
        return torch.load(path, map_location="cpu")


def load_reference_checkpoint(
    generator,
    g_path: str,
    discriminator=None,
    d_path: Optional[str] = None,
):
    """Load reference ``.pth`` files from disk (requires torch, cpu-only).

    → (params_G, params_D or None, batch_stats_D or None).
    """
    params_G = import_generator_state_dict(_load_state_dict(g_path), generator)
    params_D = batch_stats_D = None
    if d_path is not None:
        if discriminator is None:
            raise ValueError("d_path given but no discriminator module")
        params_D, batch_stats_D = import_discriminator_state_dict(
            _load_state_dict(d_path), discriminator
        )
    return params_G, params_D, batch_stats_D


def load_reference_discriminator(discriminator, d_path: str):
    """Load a reference ``D_{it}.pth`` alone → (params_D, batch_stats_D).

    Used when the generator source is an Orbax checkpoint (or absent) but
    the discriminator warm-start comes from a reference file
    (env.discriminator_load_path, reference baseGAN.load_model:52-60)."""
    return import_discriminator_state_dict(
        _load_state_dict(d_path), discriminator
    )
