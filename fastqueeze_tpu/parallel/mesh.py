"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference scales with pthreads over 50 MB blocks on one host
(SURVEY.md §2.3).  The TPU-native mapping:

* **block axis (data parallel)** — blocks (or block shards of the training
  prefix) are distributed across devices; each device runs the full
  per-block coding pipeline on its shard.  Per-block payloads are
  independent byte strings, gathered host-side into the container — the
  analogue of the reference's mergeFile.
* **ctx axis (tensor parallel analogue)** — the frozen model count tables
  (up to 4^order contexts for the sequence model) can be sharded over their
  context dimension; training reduces with psum_scatter so each device
  keeps only its table shard.

Everything here is shard_map over a Mesh with explicit PartitionSpecs, so
XLA inserts the ICI collectives.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastqueeze_tpu.config import CodecParams
from fastqueeze_tpu.models.base import CtxModel
from fastqueeze_tpu.ops import engine


def make_mesh(n_devices: Optional[int] = None,
              ctx_shards: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"need {n} devices, have {len(devs)}")
    if n % ctx_shards:
        raise ValueError("n_devices must be divisible by ctx_shards")
    arr = np.array(devs[:n]).reshape(n // ctx_shards, ctx_shards)
    return Mesh(arr, ("block", "ctx"))


def train_counts_sharded(mesh: Mesh, model: CtxModel,
                         syms: jnp.ndarray, valid: jnp.ndarray,
                         aux: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Frozen-model training over a mesh.

    syms/valid/aux['pos']: (B, T, L) stacked block grids, sharded over the
    'block' axis.  Each device histograms its blocks, then the tables are
    psum-reduced over 'block' and scattered over 'ctx' — the result is the
    global frozen table, sharded over its context dimension.
    """
    n_ctx_local = model.n_ctx // mesh.shape["ctx"]

    def local_train(s, v, pos):
        # accumulate raw histograms over this device's blocks
        def one(sb, vb, pb):
            ctx = model.context_grids(sb, {"pos": pb, "start": pb == 0})
            flat = ctx.astype(jnp.int32) * model.alphabet + sb.astype(jnp.int32)
            n = model.n_ctx * model.alphabet
            flat = jnp.where(vb, flat, n).reshape(-1)
            hist = jnp.zeros((n + 1,), jnp.int32).at[flat].add(model.inc)
            return hist[:n].reshape(model.n_ctx, model.alphabet)

        hists = jax.vmap(one)(s, v, pos)
        local = hists.sum(axis=0)
        # all-reduce over the block axis; keep only this device's row shard
        # along ctx (reduce-scatter semantics)
        full = jax.lax.psum(local, "block")
        mine = jax.lax.dynamic_slice_in_dim(
            full, jax.lax.axis_index("ctx") * n_ctx_local, n_ctx_local, 0)
        counts = mine + model.init
        for _ in range(24):
            tot = counts.sum(axis=1, keepdims=True)
            counts = jnp.where(tot > model.cap, (counts + 1) >> 1, counts)
        return counts

    fn = shard_map(
        local_train, mesh=mesh,
        in_specs=(P("block"), P("block"), P("block")),
        out_specs=P("ctx"), check_vma=False,
    )
    return jax.jit(fn)(syms, valid, aux["pos"])


def align_blocks_sharded(mesh: Mesh, cfg, keys, offsets, positions, packed,
                         l1, ref_len, codes, dege, lengths):
    """Data-parallel alignment over the mesh: the index arrays are
    replicated across devices (the reference's POSIX-shm index sharing,
    SURVEY.md §2.3, mapped to a pod slice); read batches shard over the
    'block' axis.  codes/dege: (B, R, Lp) grids, lengths: (B, R)."""
    from fastqueeze_tpu.align import hash as H

    def local(ks, off, pos, pk, l1_, c, d, ln):
        def one(cb, db, lb):
            return H._align_batch(cfg, ks, off, pos, pk, l1_,
                                  jnp.int32(ref_len), cb, db, lb)
        return jax.vmap(one)(c, d, ln)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(),
                  P("block"), P("block"), P("block")),
        out_specs=(P("block"), P("block"), P("block"), P("block")),
        check_vma=False,
    )
    return jax.jit(fn)(keys, offsets, positions, packed, l1,
                       codes, dege, lengths)


def encode_blocks_sharded(mesh: Mesh, model: CtxModel, n_halve: int,
                          counts0: jnp.ndarray,
                          syms: jnp.ndarray, valid: jnp.ndarray,
                          pos: jnp.ndarray):
    """Data-parallel block coding: every device runs pass1+pass2 for its
    shard of blocks against a replicated (frozen or init) model table.
    Returns per-block (start,freq) words/emits/final-states, block-sharded.
    """

    def local(c0, s, v, p):
        def one(sb, vb, pb):
            ctx = model.context_grids(sb, {"pos": pb, "start": pb == 0})
            start, freq, _ = engine._pass1(model, n_halve, c0, ctx, sb, vb)
            words, emits, x_final = engine._pass2(start, freq, vb)
            return words, emits, x_final

        return jax.vmap(one)(s, v, p)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("block"), P("block"), P("block")),
        out_specs=(P("block"), P("block"), P("block")), check_vma=False,
    )
    return jax.jit(fn)(counts0, syms, valid, pos)
