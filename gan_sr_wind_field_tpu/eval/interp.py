"""Network interpolation: alpha-blend two trained generators.

The ESRGAN deployment technique (Wang et al. 2018, §3.4): linearly
interpolate ALL generator parameters between a PSNR-oriented model (e.g.
pixel-dominant / no_adv training) and a GAN-trained model,

    theta = alpha * theta_gan + (1 - alpha) * theta_psnr,

trading perceptual sharpness against fidelity WITHOUT retraining.  The
reference trains both kinds of model (its ``*_no_adv`` pretrained configs
vs the full-GAN ones) but has no interpolation tooling; this closes that
gap for the wind-field setting, where the same PSNR-vs-adversarial
trade-off exists between pixel-dominant and physics/GAN-weighted runs.

CLI (emits a self-contained serving artifact, eval/export.py):

    python -m gan_sr_wind_field_tpu.eval.interp --cfg run_cfg.ini \
        --gan ckpt_or_G.pth --psnr ckpt_or_G.pth --alpha 0.8 \
        --out blended.wsrx

Both checkpoints must come from the SAME architecture config (this
framework's Orbax run checkpoints or reference ``.pth`` state_dicts —
anything `WindFieldSR.from_checkpoint` accepts).
"""

from __future__ import annotations

import jax


def blend_params(params_gan, params_psnr, alpha: float):
    """alpha * params_gan + (1 - alpha) * params_psnr, leaf-wise.

    The trees must match exactly (same architecture); alpha in [0, 1]
    (0 = pure PSNR model, 1 = pure GAN model).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    treedef_a = jax.tree.structure(params_gan)
    treedef_b = jax.tree.structure(params_psnr)
    if treedef_a != treedef_b:
        raise ValueError(
            "checkpoints have different parameter structures — network "
            "interpolation needs two models of the SAME architecture"
        )
    import jax.numpy as jnp

    a = jnp.float32(alpha)
    return jax.tree.map(
        lambda g, p: (a * g.astype(jnp.float32)
                      + (1 - a) * p.astype(jnp.float32)).astype(g.dtype),
        params_gan, params_psnr,
    )


def interpolated_sr(cfg, path_gan: str, path_psnr: str, alpha: float,
                    x, y, norm_stats=None):
    """A `WindFieldSR` serving the blended generator."""
    from gan_sr_wind_field_tpu.eval.serve import WindFieldSR

    sr_gan = WindFieldSR.from_checkpoint(cfg, path_gan, x, y)
    sr_psnr = WindFieldSR.from_checkpoint(cfg, path_psnr, x, y)
    sr_gan.params_G = blend_params(sr_gan.params_G, sr_psnr.params_G, alpha)
    if norm_stats is not None:
        sr_gan.norm_stats = norm_stats
    return sr_gan


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        description="Blend two trained generators (ESRGAN network "
                    "interpolation) into a serving artifact"
    )
    p.add_argument("--cfg", required=True, help="architecture config INI")
    p.add_argument("--gan", required=True,
                   help="GAN-trained checkpoint (Orbax dir or G .pth)")
    p.add_argument("--psnr", required=True,
                   help="PSNR-oriented checkpoint (pixel-dominant run)")
    p.add_argument("--alpha", type=float, required=True,
                   help="GAN weight in [0,1]: 0 = pure PSNR, 1 = pure GAN")
    p.add_argument("--out", required=True, help="output .wsrx artifact")
    p.add_argument("--stats_from", default=None, metavar="ARTIFACT.wsrx",
                   help="copy norm_stats from an existing export so the "
                        "blended artifact supports physical-units serving "
                        "(checkpoints do not carry normalization stats)")
    args = p.parse_args(argv)

    import os

    if os.environ.get("WINDSR_PLATFORM"):  # same override as run.py
        jax.config.update("jax_platforms", os.environ["WINDSR_PLATFORM"])

    import numpy as np

    from gan_sr_wind_field_tpu.config import load_config
    from gan_sr_wind_field_tpu.eval.export import export_generator

    cfg = load_config(args.cfg)
    # coordinate extents only shape the default patch geometry; the
    # artifact itself is geometry-complete from the config
    n = (cfg.gan_config.slice_size if cfg.gan_config.enable_slicing
         else 128)
    x = np.arange(n, dtype=np.float32) * 150.0
    stats = None
    if args.stats_from:
        from gan_sr_wind_field_tpu.eval.export import read_header

        stats = read_header(args.stats_from).get("norm_stats")
        if stats is None:
            raise SystemExit(
                f"{args.stats_from} carries no norm_stats — re-export it "
                "with stats to use --stats_from"
            )
    sr = interpolated_sr(cfg, args.gan, args.psnr, args.alpha, x, x,
                         norm_stats=stats)
    header = export_generator(sr.gan, sr.params_G, args.out,
                              norm_stats=stats)
    print(f"blended alpha={args.alpha} -> {args.out} "
          f"(platforms {header['platforms']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
