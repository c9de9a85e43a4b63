"""Checkpoint / resume.

The reference has no persistence whatsoever — no torch.save/load anywhere;
the model dies with the process (SURVEY.md §5.4). Here any pytree (params,
optimizer state, RNG key, step counter — i.e. a full TrainState) round-trips
through a single ``.npz`` file keyed by tree path. Self-contained (numpy
only) so checkpoints are portable and inspectable; restore validates that
the tree structure and leaf shapes match the provided template.
"""

from __future__ import annotations

import os
from typing import Any, TypeVar

import jax
import numpy as np

T = TypeVar("T")

_SEP = "|"


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return _SEP.join(parts)


def save_checkpoint(path: str | os.PathLike, state: Any) -> str:
    """Write ``state`` (any pytree of arrays) to ``path`` (.npz appended if
    missing). Atomic: writes to a temp file then renames."""
    path = os.fspath(path)
    if not path.endswith(".npz"):
        path += ".npz"
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    for p, leaf in flat:
        key = _path_str(p)
        if key in arrays:
            raise ValueError(f"duplicate tree path {key!r}")
        arrays[key] = np.asarray(leaf)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)
    return path


def restore_checkpoint(path: str | os.PathLike, template: T) -> T:
    """Load a checkpoint into the structure of ``template`` (e.g. a freshly
    initialized TrainState). Shapes and paths must match exactly."""
    path = os.fspath(path)
    if not path.endswith(".npz"):
        path += ".npz"
    with np.load(path) as data:
        loaded = dict(data.items())
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = _path_str(p)
        if key not in loaded:
            raise KeyError(f"checkpoint missing {key!r} (has {sorted(loaded)[:5]}...)")
        arr = loaded.pop(key)
        want = np.shape(leaf)
        if tuple(arr.shape) != tuple(want):
            raise ValueError(f"{key!r}: checkpoint shape {arr.shape} != template {want}")
        want_dtype = np.asarray(leaf).dtype
        if arr.dtype != want_dtype:
            raise ValueError(
                f"{key!r}: checkpoint dtype {arr.dtype} != template {want_dtype} "
                "(a silent cast would mask a bf16/f32 mixup)"
            )
        leaves.append(jax.numpy.asarray(arr, dtype=want_dtype))
    if loaded:
        raise ValueError(f"checkpoint has extra entries: {sorted(loaded)[:5]}")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )


# ---------------------------------------------------------------- orbax
# Async, multi-host-aware checkpointing for production runs; the npz format
# above stays the zero-dependency portable default.


def save_checkpoint_orbax(path: str | os.PathLike, state: Any) -> str:
    """Write ``state`` with orbax (directory checkpoint; multi-host safe)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.fspath(path))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def restore_checkpoint_orbax(path: str | os.PathLike, template: T) -> T:
    """Restore an orbax checkpoint into ``template``'s structure/dtypes."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.fspath(path))
    with ocp.PyTreeCheckpointer() as ckptr:
        restore_args = jax.tree_util.tree_map(
            lambda leaf: ocp.ArrayRestoreArgs(dtype=np.asarray(leaf).dtype),
            template,
        )
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(
                item=template, restore_args=restore_args
            ),
        )
