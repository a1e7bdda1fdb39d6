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
from typing import Any, Optional

import flax
import jax
import orbax.checkpoint as ocp

from gan_sr_wind_field_tpu.train.gan import GANTrainState


class _LegacyStateV1(flax.struct.PyTreeNode):
    """Pre-EMA GANTrainState layout — checkpoints written before the
    ``params_G_ema`` field existed have no such key on disk at all (not
    even an empty node), so they need their own restore structure."""

    params_G: Any
    params_D: Any
    batch_stats_D: Any
    params_D_frozen: Any
    opt_state_G: Any
    opt_state_D: Any
    it: Any
    rng: Any


_LEGACY_FIELDS = (
    "params_G", "params_D", "batch_stats_D", "params_D_frozen",
    "opt_state_G", "opt_state_D", "it", "rng",
)


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
    state with identical shapes).

    The optional EMA slot (``params_G_ema``, cfg g_ema_decay) is
    reconciled across configs: a checkpoint WITH an EMA restores fine
    under a non-EMA config (and the EMA weights are kept, so inference
    callers can still prefer them); a pre-EMA checkpoint restored under
    an EMA config seeds the EMA from the restored live weights.
    """
    ckptr = ocp.StandardCheckpointer()

    def _attempt(example):
        abstract = jax.tree.map(
            ocp.utils.to_shape_dtype_struct, _to_savable(example)
        )
        return _from_savable(ckptr.restore(os.path.abspath(path), abstract))

    def _with_ema():
        # checkpoint HAS an EMA subtree, example has none: same shape as
        # params_G
        alt = example_state.replace(
            params_G_ema=jax.tree.map(lambda p: p, example_state.params_G)
        )
        return _attempt(alt)

    def _without_ema():
        # new-layout checkpoint saved with EMA disabled (empty slot)
        return _attempt(example_state.replace(params_G_ema=None))

    def _legacy():
        # pre-EMA checkpoint: the params_G_ema key does not exist on disk
        ex = _LegacyStateV1(
            **{f: getattr(example_state, f) for f in _LEGACY_FIELDS}
        )
        r = _attempt(ex)
        return GANTrainState(
            **{f: getattr(r, f) for f in _LEGACY_FIELDS},
            params_G_ema=None,
        )

    def _seed_ema(restored):
        # enabling EMA on an older run: start the average from the
        # restored live weights (distinct buffers for donation)
        import jax.numpy as jnp

        return restored.replace(
            params_G_ema=jax.tree.map(jnp.copy, restored.params_G)
        )

    try:
        return _attempt(example_state)
    except Exception as first_err:
        if example_state.params_G_ema is None:
            fallbacks = (_legacy, _with_ema)
        else:
            fallbacks = (
                lambda: _seed_ema(_without_ema()),
                lambda: _seed_ema(_legacy()),
            )
        for fb in fallbacks:
            try:
                return fb()
            except Exception:
                continue
        raise first_err
