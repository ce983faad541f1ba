"""Checkpoint / resume for training state.

The reference keeps its best-validation snapshot only in memory
(trainable.py:61,97,101-102) — a preempted job loses everything (SURVEY
§5.3-5.4).  Here the full early-stopping state (current + best params,
optimizer state, epoch, patience, best validation loss, RNG seed) is
persisted so a preempted TPU job resumes mid-search with identical
semantics.

Format: one ``.npz`` per checkpoint holding every array leaf (flattened
pytree paths as keys) plus a JSON manifest for scalars/treedef — atomic
via write-to-temp + rename, dependency-free, and restores on any backend.
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

_SEP = "|"  # path separator in npz keys (param names may contain '/')


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(directory: str, step: int, *, params, opt_state=None,
                    meta: Optional[Dict[str, Any]] = None,
                    best_params=None, keep: int = 3) -> str:
    """Write checkpoint ``step``; returns its path.  Old checkpoints beyond
    ``keep`` are pruned (best-marked ones are always kept by passing them in
    ``meta`` as ``{"is_best": True}``)."""
    os.makedirs(directory, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    for group, tree in (("params", params), ("opt", opt_state),
                        ("best", best_params)):
        if tree is not None:
            for k, v in _flatten(tree).items():
                arrays[f"{group}{_SEP}{k}"] = v
    path = os.path.join(directory, f"ckpt_{step:08d}.npz")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)

    manifest = {"step": step, "meta": meta or {},
                "groups": sorted({k.split(_SEP, 1)[0] for k in arrays})}
    mpath = os.path.join(directory, f"ckpt_{step:08d}.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)

    _prune(directory, keep)
    return path


def _prune(directory: str, keep: int) -> None:
    steps = sorted(all_steps(directory))
    for s in steps[:-keep] if keep > 0 else []:
        for ext in (".npz", ".json"):
            try:
                os.remove(os.path.join(directory, f"ckpt_{s:08d}{ext}"))
            except OSError:
                pass


def all_steps(directory: str):
    if not os.path.isdir(directory):
        return []
    out = []
    for name in os.listdir(directory):
        if name.startswith("ckpt_") and name.endswith(".npz"):
            try:
                out.append(int(name[5:-4]))
            except ValueError:
                pass
    return sorted(out)


def latest_step(directory: str) -> Optional[int]:
    steps = all_steps(directory)
    return steps[-1] if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None, *,
                       params_template=None, opt_template=None
                       ) -> Optional[Tuple[int, Dict[str, Any]]]:
    """Load checkpoint ``step`` (default: latest).  Returns
    ``(step, {"params":..., "opt_state":..., "best_params":..., "meta":...})``
    or None if no checkpoint exists.

    With templates the arrays are unflattened into the template's treedef
    (required for non-dict pytrees like optax states); plain-dict params
    restore without a template.
    """
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None
    with np.load(os.path.join(directory, f"ckpt_{step:08d}.npz")) as z:
        arrays = {k: z[k] for k in z.files}
    with open(os.path.join(directory, f"ckpt_{step:08d}.json")) as f:
        manifest = json.load(f)

    def group(name):
        prefix = name + _SEP
        return {k[len(prefix):]: v for k, v in arrays.items()
                if k.startswith(prefix)}

    def rebuild(flat, template):
        if template is None:
            return dict(flat) or None
        leaves_p, treedef = jax.tree_util.tree_flatten_with_path(template)
        keys = [_SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                          for p in path) for path, _ in leaves_p]
        leaves = [jax.numpy.asarray(flat[k]) for k in keys]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    out = {
        "params": rebuild(group("params"), params_template),
        "opt_state": rebuild(group("opt"), opt_template)
        if "opt" in manifest["groups"] else None,
        "best_params": rebuild(group("best"), params_template)
        if "best" in manifest["groups"] else None,
        "meta": manifest["meta"],
    }
    return step, out
