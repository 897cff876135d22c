"""Multi-chip sharding of the FMD-index and its queries.

Parallel axes (the framework's mesh vocabulary — SURVEY.md §2.6):
  dp — reads/queries sharded across devices (data parallel)
  tp — the rank table (BWT blocks + occ rows) sharded by block range; a rank
       query is answered by the owning shard and combined with a psum over
       ICI (suffix-range "tensor parallel" of the index)

Both combine in one mesh; backward search / extension steps run under
shard_map with queries on dp and the index on tp.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from fermi_tpu.index.fmd import BLOCK_BITS, BLOCK


def make_mesh(devices=None, dp=None, tp=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    if dp is None:
        dp = n // tp
    dev = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(dev, ("dp", "tp"))


def pad_index_for_tp(blocks: np.ndarray, occ: np.ndarray, tp: int):
    """Pad block count to a multiple of tp so rows shard evenly."""
    nb = blocks.shape[0]
    pad = (-nb) % tp
    if pad:
        blocks = np.concatenate(
            [blocks, np.full((pad, blocks.shape[1]), 6, blocks.dtype)])
        occ = np.concatenate([occ, np.repeat(occ[-1:], pad, axis=0)])
    return blocks, occ


def sharded_rank6(mesh: Mesh):
    """Returns rank6(blocks, occ, cnt, k) with blocks/occ sharded over tp and
    k sharded over dp; the owning tp shard answers, psum combines."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P("tp", None), P("tp", None), P("dp")),
             out_specs=P("dp", None))
    def rank6(blocks_l, occ_l, k):
        tp = jax.lax.axis_size("tp")
        d = jax.lax.axis_index("tp")
        nb_local = blocks_l.shape[0]
        blk = (k >> BLOCK_BITS).astype(jnp.int32)
        off = (k & (BLOCK - 1)).astype(jnp.int32)
        lo = d * nb_local
        local_blk = jnp.clip(blk - lo, 0, nb_local - 1)
        rows = blocks_l[local_blk]
        base = occ_l[local_blk][..., :6]
        pos_ok = jnp.arange(BLOCK, dtype=jnp.int32) < off[..., None]
        eq = rows[..., None] == jnp.arange(6, dtype=jnp.uint8)
        within = jnp.sum(eq & pos_ok[..., None], axis=-2,
                         dtype=base.dtype)
        cnt = base + within
        owned = (blk >= lo) & (blk < lo + nb_local)
        cnt = jnp.where(owned[..., None], cnt, 0)
        return jax.lax.psum(cnt, "tp")

    return rank6


def sharded_backward_search_step(mesh: Mesh):
    """One backward-search step over (k, l) intervals: dp-sharded queries,
    tp-sharded index. Returns the jittable step function."""
    rank6 = sharded_rank6(mesh)

    def step(blocks, occ, cnt, k, l, c):
        ok = rank6(blocks, occ, k)
        ol = rank6(blocks, occ, l + 1)
        ci = c.astype(jnp.int32)
        nk = cnt[ci] + jnp.take_along_axis(ok, ci[:, None], axis=1)[:, 0]
        nl = cnt[ci] + jnp.take_along_axis(ol, ci[:, None], axis=1)[:, 0] - 1
        alive = nk <= nl
        k = jnp.where(alive, nk, k)
        l = jnp.where(alive, nl, l)
        return k, l, alive

    return step
