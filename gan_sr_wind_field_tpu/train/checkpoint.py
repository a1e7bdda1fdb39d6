"""Checkpoint / resume via Orbax.

Counterpart of the reference's ``G_{it}.pth / D_{it}.pth / state_{it}.pth``
torch saves (GAN_models/baseGAN.py:39-106): one Orbax checkpoint per
`save_model_period` holding the full GANTrainState — params, optimizer
moments, BN stats, the frozen-feature params, iteration counter, and PRNG key
— so resume is bit-exact (the schedules are pure functions of `it`). The
resolved config INI is snapshotted next to the run like run.py:279-288.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import orbax.checkpoint as ocp

from gan_sr_wind_field_tpu.train.gan import GANTrainState


def _to_savable(state: GANTrainState):
    # typed PRNG keys are not serialisable; store raw key data
    return state.replace(rng=jax.random.key_data(state.rng))


def _from_savable(state: GANTrainState):
    return state.replace(rng=jax.random.wrap_key_data(state.rng))


def save_checkpoint(
    run_folder: str, state: GANTrainState, keep_last: int = 0
) -> str:
    """Write a checkpoint for the state's current iteration.

    ``keep_last`` > 0 prunes older ``ckpt_*`` dirs down to that many (a full
    GAN state is ~0.5 GB; the reference keeps everything, baseGAN.py:82-106,
    which is the default here too).
    """
    it = int(state.it)
    path = os.path.abspath(os.path.join(run_folder, f"ckpt_{it}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_savable(state), force=True)
    ckptr.wait_until_finished()
    # multi-host: every process calls the (collective) Orbax save, but only
    # process 0 prunes — concurrent rmtree of the same dirs would race
    if keep_last and keep_last > 0 and jax.process_index() == 0:
        import shutil

        its = sorted(
            int(m.group(1))
            for name in os.listdir(run_folder)
            if (m := re.fullmatch(r"ckpt_(\d+)", name))
        )
        for old in its[:-keep_last]:
            shutil.rmtree(
                os.path.join(run_folder, f"ckpt_{old}"), ignore_errors=True
            )
    return path


def latest_checkpoint(run_folder: str) -> Optional[str]:
    if not os.path.isdir(run_folder):
        return None
    best_it, best = -1, None
    for name in os.listdir(run_folder):
        m = re.fullmatch(r"ckpt_(\d+)", name)
        if m and int(m.group(1)) > best_it:
            best_it, best = int(m.group(1)), os.path.join(run_folder, name)
    return os.path.abspath(best) if best else None


def restore_checkpoint(path: str, example_state: GANTrainState) -> GANTrainState:
    """Restore into the structure of ``example_state`` (a freshly-inited
    state with identical shapes)."""
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        ocp.utils.to_shape_dtype_struct, _to_savable(example_state)
    )
    restored = ckptr.restore(os.path.abspath(path), abstract)
    return _from_savable(restored)
