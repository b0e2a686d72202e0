"""Checkpoint/resume for streaming pipeline state.

The reference has no checkpointing (SURVEY.md §5 — all DSP state is
ephemeral and hidden inside liquid-dsp objects).  Because every operator
here carries its state as an explicit pytree (filter tails, NCO phase,
resampler timing, synchronizer overlap buffers), a long-running pipeline
can be checkpointed and resumed bit-exactly with a generic pytree dump:
``save_state``/``load_state`` round-trip any of the framework's state
objects through a single ``.npz`` file.
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_state", "load_state"]


def _norm(path: str) -> str:
    """np.savez appends '.npz' to bare paths; normalize so save/load agree."""
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, state) -> None:
    """Serialize a pytree of arrays to ``path`` (.npz + structure JSON)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8)
    np.savez(_norm(path), **arrays)


def load_state(path: str, like):
    """Load a checkpoint into the structure of ``like`` (same pipeline
    config); returns the restored pytree."""
    data = np.load(_norm(path))
    leaves_like, treedef = jax.tree.flatten(like)
    n = len(leaves_like)
    n_stored = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_stored != n:
        raise ValueError(
            f"checkpoint holds {n_stored} leaves, pipeline state has "
            f"{n} — config mismatch")
    if "__treedef__" in data.files:
        stored = json.loads(bytes(data["__treedef__"]).decode())
        if stored != str(treedef):
            raise ValueError(
                "checkpoint pytree structure differs from the pipeline "
                f"state — config mismatch\n  stored:  {stored}\n"
                f"  current: {treedef}")
    leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        ref = leaves_like[i]
        if arr.shape != np.shape(ref):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != pipeline "
                f"state shape {np.shape(ref)} — config mismatch")
        ref_dtype = np.asarray(ref).dtype
        if arr.dtype != ref_dtype:
            raise ValueError(
                f"checkpoint leaf {i} dtype {arr.dtype} != pipeline "
                f"state dtype {ref_dtype} — config mismatch")
        leaves.append(jnp.asarray(arr))
    return jax.tree.unflatten(treedef, leaves)
