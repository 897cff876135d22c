"""Pallas TPU kernel for the FMD rank count — the system's hot primitive.

Reference rld_rank2a (/root/reference/rld.c:457-492) walks a compressed
block per query on one core.  Here thousands of queries are ranked per call:
XLA gathers the 64-byte nibble-packed block rows (gathers pipeline at
~1.6 ns/row and are already speed-of-light; BENCH_NOTES.md), and this kernel
fuses the masked per-symbol count entirely in VMEM — the round-1 XLA one-hot
count materialized [B, W, 6, 128] int8 intermediates (~50 MB per extend6) in
HBM, which capped SMEM throughput once loop overhead was fixed.

Mosaic lowering rules baked in (see ops/sw_pallas.py and the
pallas-mosaic-gotchas memory): x64 disabled around the call, int32-only
vectors, 2D iota, (8,128)-aligned or full-dim blocks.
"""

from functools import partial

import numpy as np

from fermi_tpu import jaxcfg  # noqa: F401

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NIB1 = 0x11111111
_G = 1024  # rows per grid step: words 64 KB + out 32 KB in VMEM


def _swar_counts(words, offx, jpos):
    """words int32 [..., 16], offx int32 [..., 1], jpos int32 [1, 16] (j*8).
    Returns list of 6 per-row counts, each [..., 1] int32.  Identical math
    to index.fmd._swar_rank_count (property-tested against it)."""
    i32 = jnp.int32
    t = jnp.clip(offx - jpos, 0, 8)
    allowed = jnp.where(t >= 8, i32(_NIB1),
                        ((i32(1) << (4 * jnp.minimum(t, 7))) - 1) & _NIB1)
    outs = []
    for c in range(6):
        x = words ^ i32(c * _NIB1)
        nz = (x | (x >> 1) | (x >> 2) | (x >> 3)) & _NIB1
        zeros = (~nz) & allowed
        per_word = ((zeros * i32(_NIB1)) >> 28) & 15
        outs.append(jnp.sum(per_word, axis=-1, keepdims=True, dtype=i32))
    return outs


def _rank_kernel(words_ref, off_ref, out_ref):
    words = words_ref[:]                                  # [G, 16]
    offx = off_ref[:]                                     # [G, 1]
    jpos = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1) * 8
    cnts = _swar_counts(words, offx, jpos)                # 6 x [G, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (words.shape[0], 8), 1)
    out = jnp.zeros((words.shape[0], 8), jnp.int32)
    for c in range(6):
        out = jnp.where(lane == c, cnts[c], out)
    out_ref[:] = out


@partial(jax.jit, static_argnames=("interpret",))
def rank_block_counts(words: jnp.ndarray, off: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Within-block prefix counts for N rank queries.

    words: int32 [N, 16] gathered nibble-packed block rows;
    off:   int32 [N] prefix length in [0, 128].
    Returns int32 [N, 8] (cols 0..5 = counts, 6..7 = 0).
    """
    n = words.shape[0]
    npad = max(_G, ((n + _G - 1) // _G) * _G)
    if npad != n:
        words = jnp.pad(words, ((0, npad - n), (0, 0)))
        off = jnp.pad(off, (0, npad - n))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _rank_kernel,
            grid=(npad // _G,),
            in_specs=[
                pl.BlockSpec((_G, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_G, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_G, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((npad, 8), jnp.int32),
            interpret=interpret,
        )(words.astype(jnp.int32), off.astype(jnp.int32).reshape(npad, 1))
    return out[:n]
