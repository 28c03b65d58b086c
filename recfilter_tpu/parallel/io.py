"""Host-sharded IO: assemble inputs larger than one host's memory.

The reference loads whole images into one process's RAM before realization
(``copy_to_dev``, ``lib/recfilter.cpp:959-967``) — a single-GPU ceiling.
Here an input is materialized directly as a sharded ``jax.Array``: each
process loads ONLY the slices backing its addressable devices
(``jax.make_array_from_callback``), so a pod can filter an image no single
host could hold. The natural pairing is the sequence/data sharding of
``parallel.sharding.sharded_apply_filter`` — load with the same
NamedSharding the filter will run under and no resharding happens at all.

For on-disk sources, ``load_npy_sharded`` memory-maps a ``.npy`` file and
reads only the addressed windows — true out-of-core loading with the
stdlib-only constraint this repo keeps (PNG/PPM in ``utils.image_io`` are
whole-file formats; convert to .npy for out-of-core sizes).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_sharded_array(
    loader: Callable[[Tuple[slice, ...]], np.ndarray],
    global_shape: Sequence[int],
    mesh: Mesh,
    pspec: P,
    dtype=jnp.float32,
) -> jax.Array:
    """Build a global array from per-shard loads.

    ``loader(index)`` receives a tuple of slices (one per axis, with
    concrete start/stop) and must return exactly that window of the global
    array. It is called once per addressable shard on each process — no
    process ever sees the whole array.
    """
    sharding = NamedSharding(mesh, pspec)

    def cb(index: Tuple[slice, ...]):
        # Normalize open-ended slices to concrete bounds for the loader.
        idx = tuple(
            slice(
                0 if s.start is None else int(s.start),
                int(dim) if s.stop is None else int(s.stop),
            )
            for s, dim in zip(index, global_shape)
        )
        block = np.asarray(loader(idx))
        expect = tuple(s.stop - s.start for s in idx)
        if tuple(block.shape) != expect:
            raise ValueError(
                f"loader returned shape {block.shape} for window {idx} "
                f"(expected {expect})"
            )
        return jnp.asarray(block, dtype)

    return jax.make_array_from_callback(
        tuple(int(d) for d in global_shape), sharding, cb
    )


def load_npy_sharded(
    path: str,
    mesh: Mesh,
    pspec: P,
    dtype=jnp.float32,
) -> jax.Array:
    """Memory-map a ``.npy`` file and materialize it as a sharded array,
    each process reading only its addressable windows from disk."""
    mm = np.load(path, mmap_mode="r")

    def loader(idx):
        return np.array(mm[idx])  # copies just the window out of the map

    return host_sharded_array(loader, mm.shape, mesh, pspec, dtype)


def save_npy_sharded(arr: jax.Array, path_prefix: str) -> list:
    """Write each addressable shard as ``{prefix}.a{axis}s{start}….npy``
    (one ``aNsM`` pair per axis, e.g. ``out.a0s0.a1s32.npy``), returning
    the (path, starts) tuples — the per-process half of a pod-scale
    writeback (no host gathers the global array). Reassemble with
    :func:`assemble_npy_shards` (or any tool that places windows)."""
    paths = []
    for shard in arr.addressable_shards:
        idx = shard.index
        stamp = "".join(
            f".a{ax}s{0 if s.start is None else int(s.start)}"
            for ax, s in enumerate(idx)
        )
        p = f"{path_prefix}{stamp}.npy"
        np.save(p, np.asarray(shard.data))
        paths.append((p, tuple(
            (0 if s.start is None else int(s.start)) for s in idx
        )))
    return paths


def assemble_npy_shards(paths, global_shape, dtype=np.float32) -> np.ndarray:
    """Test/debug helper: place index-stamped shard files back into one
    array (requires enough memory — intended for verification, not the
    production path)."""
    out = np.zeros(tuple(global_shape), dtype)
    for p, starts in paths:
        block = np.load(p)
        sl = tuple(
            slice(s, s + e) for s, e in zip(starts, block.shape)
        )
        out[sl] = block
    return out
