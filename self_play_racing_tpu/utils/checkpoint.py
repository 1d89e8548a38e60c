"""Checkpointing: flat-array pytree snapshots (npz) with a JSON sidecar for host state.

Equivalent of the reference's full training checkpoint (self_play_ppo.py:154-167):
agent params, optimizer state, update counter, the entire opponent pool,
config echo, and training curves — everything needed for ``resume_from``.

npz keeps this dependency-light and fast for the MLP-sized states here; the pytree
structure is supplied by the caller as a template on load (orbax-style structured
checkpointing can layer on top for multi-host async saves).

Format v1 (current): leaves are NAME-addressed by their flattened pytree key path
(``jax.tree_util.keystr``) and the file carries ``format_version``. Loading
matches checkpoint names against the template's key paths, so a reordered or
renamed pytree fails loudly with the offending paths instead of silently loading
wrong leaves into wrong slots (the failure mode of the index-addressed v0
layout). v0 files (no ``format_version`` key) still load via positional
matching for backward compatibility; see ``format_version()`` for dispatch.
"""
from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

FORMAT_VERSION = 1


def _to_host(flat):
    """Fetch a list of device arrays to host numpy.

    Single-process (fully addressable): every leaf is bitcast to uint8 and
    concatenated on device, fetched as ONE buffer, and split back on the host —
    per-leaf np.asarray costs one tunnel round trip each (~0.45s on the axon TPU
    link).

    Multi-process (some leaf sharded across processes): np.asarray on a
    non-fully-addressable array raises, so each such leaf is gathered to every
    host via ``multihost_utils.process_allgather`` (a collective — ALL processes
    must call ``_to_host`` together); fully-replicated leaves read their local
    shard directly. Every process returns the full global value, so any of them
    can serve the save (save_pytree writes from process 0 only)."""
    arrs = []
    for x in flat:
        arr = jnp.asarray(x)
        if jnp.issubdtype(arr.dtype, jax.dtypes.prng_key):
            arr = jax.random.key_data(arr)
        arrs.append(arr)

    if not all(getattr(a, "is_fully_addressable", True) for a in arrs):
        from jax.experimental import multihost_utils

        out = []
        for a in arrs:
            if getattr(a, "is_fully_addressable", True):
                out.append(np.asarray(a))
            elif getattr(a, "is_fully_replicated", False):
                out.append(np.asarray(a.addressable_data(0)))
            else:
                out.append(np.asarray(
                    multihost_utils.process_allgather(a, tiled=True)))
        return out

    metas = []
    chunks = []
    for arr in arrs:
        metas.append((arr.shape, arr.dtype))
        flat_x = arr.reshape(-1)
        if flat_x.dtype.itemsize > 1:
            flat_x = jax.lax.bitcast_convert_type(flat_x, jnp.uint8).reshape(-1)
        else:
            flat_x = flat_x.astype(jnp.uint8)
        chunks.append(flat_x)
    packed = np.asarray(jnp.concatenate(chunks)) if chunks else np.zeros(0, np.uint8)
    out = []
    offset = 0
    for shape, dtype in metas:
        nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
        buf = packed[offset:offset + nbytes]
        out.append(np.frombuffer(buf.tobytes(), dtype=dtype).reshape(shape))
        offset += nbytes
    return out


def _meta_path(path: str) -> str:
    """Sidecar path shared by save and load: <path without .npz>.meta.json."""
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".meta.json"


def _leaf_names(tree):
    """Flattened key-path name per leaf (``jax.tree_util.keystr``), in leaf order."""
    flat_with_path, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(path) for path, _ in flat_with_path]


def format_version(path: str) -> int:
    """Format version of an on-disk checkpoint: 0 for legacy index-addressed
    files (round ≤4), ``FORMAT_VERSION`` for name-addressed ones."""
    if not path.endswith(".npz") and not os.path.exists(path):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as data:
        return int(data["format_version"]) if "format_version" in data else 0


def save_pytree(path: str, tree, meta: dict | None = None):
    """Save an arbitrary pytree of arrays + a JSON-serializable ``meta`` dict.

    Leaves are stored name-addressed by flattened key path (format v1), so
    loads validate structure by name, not position.

    Multi-process safe: every process participates in the gather collectives
    (call this from ALL processes), process 0 alone writes the files, and a
    device barrier afterwards guarantees the checkpoint is on disk before any
    process proceeds (so an immediate resume on another process sees it)."""
    flat = jax.tree.leaves(tree)
    names = _leaf_names(tree)
    host = _to_host(flat)
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez(path, n_leaves=len(host), format_version=FORMAT_VERSION,
                 leaf_names=np.asarray(names),
                 **{f"leaf_{i}": x for i, x in enumerate(host)})
        if meta is not None:
            with open(_meta_path(path), "w") as f:
                json.dump(meta, f)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"save_pytree:{path}")


def load_pytree(path: str, template):
    """Load arrays saved by ``save_pytree`` into the structure of ``template``.

    v1 files match leaves by flattened key path — a checkpoint whose paths do
    not exactly cover the template's (reordered fields, renamed keys, added or
    removed leaves) raises naming the mismatched paths. v0 (legacy) files match
    by position, with shape/dtype validation as the only guard; round-≤4
    TrainState checkpoints additionally need the dead-leaf shim in
    ``agent.ppo.legacy_v0_template`` (see ``agent.self_play.load_checkpoint``).

    Returns (tree, meta) — meta is {} if no sidecar exists.
    """
    if not path.endswith(".npz") and not os.path.exists(path):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    n = int(data["n_leaves"])
    tpl_flat, treedef = jax.tree.flatten(template)
    if "format_version" in data:
        names = [str(s) for s in data["leaf_names"]]
        tpl_names = _leaf_names(template)
        if names != tpl_names:
            missing = [nm for nm in tpl_names if nm not in names]
            extra = [nm for nm in names if nm not in tpl_names]
            detail = []
            if missing:
                detail.append(f"  template paths missing from checkpoint: {missing}")
            if extra:
                detail.append(f"  checkpoint paths unknown to template: {extra}")
            if not detail:  # same name sets, different order: leaf order is
                detail.append(  # part of the schema (sharded loads stream by it)
                    f"  leaf order differs: checkpoint {names[:4]}... vs "
                    f"template {tpl_names[:4]}...")
            raise ValueError(
                f"checkpoint {path} (format v{int(data['format_version'])}) does "
                f"not match the template's pytree schema:\n" + "\n".join(detail)
            )
        flat = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    else:
        flat = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
        if treedef.num_leaves != n:
            raise ValueError(
                f"legacy (v0) checkpoint has {n} leaves but template expects "
                f"{treedef.num_leaves}"
            )
    # _to_host stored typed PRNG keys as raw key_data; rewrap where the template
    # has a typed key leaf so the round trip is symmetric
    flat = [
        jax.random.wrap_key_data(x) if (
            hasattr(t, "dtype") and jnp.issubdtype(jnp.asarray(t).dtype,
                                                   jax.dtypes.prng_key)
        ) else x
        for t, x in zip(tpl_flat, flat)
    ]
    # Leaf count alone can't catch a config mismatch (e.g. a pool_size=5
    # checkpoint resumed into a pool_size=8 trainer unflattens fine but then
    # scatters snapshots into clamped out-of-range slots). Validate shapes and
    # dtypes leaf-by-leaf so mismatched resumes fail loudly at load time.
    mismatches = []
    for i, (t, x) in enumerate(zip(tpl_flat, flat)):
        t_arr = jnp.asarray(t)
        if tuple(t_arr.shape) != tuple(x.shape) or t_arr.dtype != x.dtype:
            mismatches.append(
                f"  leaf {i}: checkpoint {x.shape} {x.dtype} vs "
                f"template {t_arr.shape} {t_arr.dtype}"
            )
    if mismatches:
        raise ValueError(
            f"checkpoint {path} does not match the template "
            f"(wrong num_envs / pool_size / hidden sizes?):\n"
            + "\n".join(mismatches)
        )
    tree = jax.tree.unflatten(treedef, flat)
    meta_path = _meta_path(path)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta
