"""Cross-session training continuation: compact committable weight packs.

Problem this solves (no reference equivalent — the reference assumes a
durable cluster filesystem, config/wind_field_GAN_3D_config_cluster.ini):
on this infrastructure only git survives a VM recycle, and a full Orbax
checkpoint (f32 params + both Adam states + D, ~600 MB) is too large to
commit. A *continuation pack* is a single compressed ``.npz`` holding just
the model weights (G, D, D batch stats, optional EMA slot) in bfloat16 —
~100 MB for the 34.7M-param flagship — plus the iteration counter, so the
next session can warm-start from git alone and keep a cumulative schedule
going across recycles.

Documented approximation: optimizer moments and the data-stream RNG are
NOT carried (they are reset on warm start, like the reference's own
``load_model_from_save`` weight loads, train.py:78-102). Evidence docs for
chained runs must note the moment reset at each session boundary.

Format: ``np.savez_compressed`` where each weight leaf is stored under a
``<tree>/<path...>`` key (trees: G, D, Dstats, Gema); bf16 leaves are
bit-cast to uint16 for portable storage (numpy cannot serialize ml_dtypes
scalars without pickle). A ``__meta__`` entry carries a JSON blob with the
format version, per-key original dtypes, and training-position metadata
(`it`). Loaders restore float32 by default (param_dtype of every config).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

import jax
import numpy as np

FORMAT_VERSION = 1
_TREES = ("G", "D", "Dstats", "Gema")


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        flat[prefix + "/" + "/".join(parts)] = np.asarray(leaf)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    """Rebuild the nested-dict tree from ``a/b/c`` keys."""
    tree: Dict[str, Any] = {}
    for key, leaf in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def save_continuation(
    path: str,
    params_G: Any,
    params_D: Any = None,
    batch_stats_D: Any = None,
    params_G_ema: Any = None,
    it: int = 0,
    store_dtype: str = "bfloat16",
    extra_meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Write a compact continuation pack; returns ``path``."""
    import ml_dtypes

    cast = (
        np.dtype(ml_dtypes.bfloat16)
        if store_dtype == "bfloat16"
        else np.dtype(store_dtype)
    )
    arrays: Dict[str, np.ndarray] = {}
    dtypes: Dict[str, str] = {}
    trees = {
        "G": params_G, "D": params_D,
        "Dstats": batch_stats_D, "Gema": params_G_ema,
    }
    for name, tree in trees.items():
        if tree is None:
            continue
        for key, leaf in _flatten(tree, name).items():
            dtypes[key] = str(leaf.dtype)
            stored = leaf.astype(cast)
            if stored.dtype == np.dtype(ml_dtypes.bfloat16):
                stored = stored.view(np.uint16)
            arrays[key] = stored
    meta = {
        "format_version": FORMAT_VERSION,
        "store_dtype": store_dtype,
        "it": int(it),
        "dtypes": dtypes,
        "trees": [n for n, t in trees.items() if t is not None],
    }
    if extra_meta:
        meta.update(extra_meta)
    arrays["__meta__"] = np.asarray(json.dumps(meta))
    np.savez_compressed(path, **arrays)
    return path


def load_continuation(path: str, dtype: str = "float32") -> Dict[str, Any]:
    """Load a pack; returns dict with params_G / params_D / batch_stats_D /
    params_G_ema (None when absent), ``it``, and the raw ``meta`` dict.

    Leaves are upcast to ``dtype`` (training param_dtype) regardless of the
    stored precision.
    """
    import ml_dtypes

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        if meta.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"continuation pack {path} has format "
                f"{meta['format_version']} > supported {FORMAT_VERSION}"
            )
        store_bf16 = meta.get("store_dtype") == "bfloat16"
        per_tree: Dict[str, Dict[str, np.ndarray]] = {t: {} for t in _TREES}
        for key in z.files:
            if key == "__meta__":
                continue
            tree_name, rest = key.split("/", 1)
            leaf = z[key]
            if store_bf16 and leaf.dtype == np.uint16:
                leaf = leaf.view(ml_dtypes.bfloat16)
            per_tree[tree_name][rest] = leaf.astype(dtype)
    out: Dict[str, Any] = {"it": int(meta.get("it", 0)), "meta": meta}
    out["params_G"] = _unflatten(per_tree["G"]) if per_tree["G"] else None
    out["params_D"] = _unflatten(per_tree["D"]) if per_tree["D"] else None
    out["batch_stats_D"] = (
        _unflatten(per_tree["Dstats"]) if per_tree["Dstats"] else None
    )
    out["params_G_ema"] = (
        _unflatten(per_tree["Gema"]) if per_tree["Gema"] else None
    )
    return out


def pack_from_state(path: str, state, it: Optional[int] = None,
                    include_ema: bool = True,
                    extra_meta: Optional[Dict[str, Any]] = None) -> str:
    """Convenience: pack a GANTrainState's weights."""
    stats = state.batch_stats_D
    # empty dicts (no-BN configs) are omitted rather than stored as zero keys
    if stats is not None and not jax.tree_util.tree_leaves(stats):
        stats = None
    return save_continuation(
        path,
        params_G=state.params_G,
        params_D=state.params_D,
        batch_stats_D=stats,
        params_G_ema=state.params_G_ema if include_ema else None,
        it=int(state.it) if it is None else it,
        extra_meta=extra_meta,
    )
