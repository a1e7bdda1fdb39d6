"""gan_sr_wind_field_tpu — TPU-native wind-field super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jacobwulffwold/GAN_SR_wind_field (3D ESRGAN super-resolution of HARMONIE-SIMRA
wind fields with physics-informed losses), built TPU-first:

- NDHWC channel-last layouts sized for the MXU (128-lane channels),
- one fully-jitted GAN train step (G/D alternation via `lax.cond`),
- explicit PRNG threading through augmentation/dropout/noise,
- `jax.sharding.Mesh` data/tensor parallelism instead of single-GPU loops,
- Pallas kernels for the nonuniform-z finite-difference stencil and other
  bandwidth-bound fusions, with pure-XLA fallbacks as parity oracles.

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
