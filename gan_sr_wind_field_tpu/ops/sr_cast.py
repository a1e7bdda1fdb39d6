"""Stochastic-rounding f32→bf16 cast + bf16 optimizer-state wrapper.

Deterministic round-to-nearest bf16 accumulators bias low-magnitude updates
to zero once |update| < ulp(moment)/2 — the classic bf16-optimizer stall.
Stochastic rounding makes the cast unbiased (E[sr(x)] = x), which lets Adam
moments live in bf16 at HALF the HBM cost without changing the optimization
trajectory in expectation (CLAUDE.md roadmap item 5; the reference keeps
f32 torch Adam state — this is an opt-in TPU extension, not parity).

Implementation note: this is deliberately pure jnp bit arithmetic, NOT a
Pallas kernel — SR-cast is elementwise, so XLA fuses it straight into the
optimizer update (a separate pallas_call would break that fusion and add an
HBM round-trip). Adding a uniform 16-bit integer to the f32 bit pattern and
truncating the low mantissa bits performs exact stochastic rounding: IEEE
bit patterns are ordered and uniformly spaced within an exponent, and the
mantissa-overflow carry steps the exponent correctly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def stochastic_round_bf16(x, key):
    """Unbiased f32→bf16 cast. ``key``: jax PRNG key (vary per step)."""
    if x.dtype != jnp.float32:
        return x
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rnd = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    out_bits = (bits + rnd) & jnp.uint32(0xFFFF0000)
    out = jax.lax.bitcast_convert_type(out_bits, jnp.float32)
    return out.astype(jnp.bfloat16)  # exact: low mantissa bits are zero


def tree_stochastic_round_bf16(tree, key):
    """SR-cast every f32 leaf of a pytree to bf16 (distinct key per leaf)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, max(len(leaves), 1))
    out = [
        stochastic_round_bf16(leaf, keys[i])
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32
        else leaf
        for i, leaf in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


class BF16SRState(NamedTuple):
    inner: optax.OptState  # f32 leaves held as bf16
    count: jnp.ndarray  # int32 step counter (drives the SR randomness)


def bf16_sr_optimizer_state(
    inner: optax.GradientTransformation, seed: int = 0
) -> optax.GradientTransformation:
    """Wrap an optimizer so its persistent state lives in bf16.

    Each update upcasts the state to f32, runs ``inner``, and SR-casts the
    new state back down — transient f32 copies exist only inside the fused
    step; the HBM-resident moments are bf16.
    """

    def _down_init(tree):  # zeros: exact in bf16, no randomness needed
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    def _up(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
            else x,
            tree,
        )

    def init(params):
        return BF16SRState(
            inner=_down_init(inner.init(params)), count=jnp.int32(0)
        )

    def update(updates, state, params=None):
        new_updates, new_inner = inner.update(
            updates, _up(state.inner), params
        )
        key = jax.random.fold_in(jax.random.key(seed), state.count)
        new_inner = tree_stochastic_round_bf16(new_inner, key)
        return new_updates, BF16SRState(
            inner=new_inner, count=state.count + 1
        )

    return optax.GradientTransformation(init, update)
