"""Checkpoint save/load.

Preserves the information content of the reference checkpoint format
(``/root/reference/trainers/base.py:231-249``: configs + iter counter + git-sha
version + state dicts of renderer/optimizer/scheduler/scaler/EMA, with the
renderer state embedding model weights AND the occupancy grid,
renderer.py:78-91) in a torch-free container: one ``.npz`` file holding

  * ``__meta__``       — JSON: version stamp, iteration counter, all configs;
  * ``<group>.NNNNN``  — the flattened leaves of each state pytree
    (params / optimizer / EMA / occupancy), restored against a structural
    template from the current code.

The recon -> style -> render checkpoint chain works exactly as in the
reference: the style stage loads model+occupancy only (``load_model_only``,
trainers/base.py:162-164), and render rebuilds everything from the stored
configs (render.py:36-88).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Tuple

import jax
import numpy as np


def save_checkpoint(path: Path, meta: Dict, trees: Dict[str, object]) -> None:
    """Write meta (JSON-serializable) + named pytrees to a single .npz."""
    arrays = {}
    structures = {}
    for group, tree in trees.items():
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        structures[group] = str(treedef)
        for i, leaf in enumerate(leaves):
            arrays[f"{group}.{i:05d}"] = np.asarray(leaf)
    meta = dict(meta)
    meta["__structures__"] = structures
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta, default=str).encode(), dtype=np.uint8
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    tmp.replace(path)


def load_checkpoint(path: Path) -> Tuple[Dict, Dict[str, list]]:
    """Read meta + per-group leaf lists (order-preserving)."""
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    groups: Dict[str, list] = {}
    keys = sorted(k for k in data.files if k != "__meta__")
    for k in keys:
        group, _idx = k.rsplit(".", 1)
        groups.setdefault(group, []).append(data[k])
    return meta, groups


def restore_tree(template, leaves: list):
    """Rebuild a pytree with the template's structure from saved leaves."""
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint leaf count {len(leaves)} does not match template "
            f"{len(t_leaves)} — config/code mismatch"
        )
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(treedef, [jnp.asarray(v) for v in leaves])
