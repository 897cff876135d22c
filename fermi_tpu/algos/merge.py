"""FMD-index merging (reference merge.c).

The gap bit-vector — for every symbol of e1, its insertion point into e0 —
is computed by backward-walking all of e1's sequences through BOTH indexes at
once: each read is a device lane, each step one LF step on e1 plus one rank
on e0 (merge.c:31-66 made batch-parallel); the walk runs in fixed-size step
chunks so the emit buffer stays small regardless of read length. The
interleave of the two BWT streams (merge.c:100-137) collapses to two numpy
scatters: route each stream's symbols to its gap positions.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from fermi_tpu.index.fmd import FMDIndex


@partial(jax.jit, static_argnames=("steps",))
def _gap_walk_chunk(e1: FMDIndex, e0: FMDIndex, k, i, done, steps: int):
    """Advance all lanes by up to `steps` LF steps, emitting k+i+1 positions
    (-1 for inactive lanes)."""
    B = k.shape[0]
    pos = jnp.full((B, steps), -1, dtype=jnp.int64)

    def body(step, carry):
        k, i, done, pos = carry
        c, kp = e1.lf(k)
        ci = c.astype(jnp.int32)
        r0 = e0.rank6(i + 1)
        ip = e0.cnt[ci] + jnp.take_along_axis(r0, ci[:, None], axis=1)[:, 0] - 1
        hit_end = c == 0
        active = ~done & ~hit_end
        k = jnp.where(active, kp, k)
        i = jnp.where(active, ip, i)
        pos = pos.at[:, step].set(
            jnp.where(active, (k + i + 1).astype(jnp.int64), -1))
        done = done | hit_end
        return k, i, done, pos

    k, i, done, pos = jax.lax.fori_loop(0, steps, body, (k, i, done, pos))
    return k, i, done, pos


def compute_gap_bits(e0: FMDIndex, e1: FMDIndex, batch=8192,
                     chunk_steps=128) -> np.ndarray:
    """bool[n0+n1]: True where the merged BWT takes its symbol from e1."""
    n0 = int(np.asarray(e0.mcnt[0]))
    n1 = int(np.asarray(e1.mcnt[0]))
    n1_seqs = int(np.asarray(e1.mcnt[1]))
    n0_seqs = int(np.asarray(e0.mcnt[1]))
    bits = np.zeros(n0 + n1, bool)
    idt = e1.idtype
    for lo in range(0, n1_seqs, batch):
        chunk = np.arange(lo, min(lo + batch, n1_seqs), dtype=np.int64)
        m = len(chunk)
        pad = batch - m
        k = jnp.asarray(np.pad(chunk, (0, pad)).astype(idt))
        i = jnp.full(batch, n0_seqs - 1, dtype=idt)
        done = jnp.zeros(batch, bool)
        done = done | (jnp.arange(batch) >= m)
        # initial emit (merge.c:42): i + k + 1 before any step
        init = np.asarray(k + i + 1)[:m]
        bits[init] = True
        while not bool(np.asarray(jnp.all(done))):
            k, i, done, pos = _gap_walk_chunk(e1, e0, k, i, done, chunk_steps)
            p = np.asarray(pos).ravel()
            bits[p[p >= 0]] = True
    return bits


def merge_bwts(bwt0: np.ndarray, bwt1: np.ndarray, bits: np.ndarray) -> np.ndarray:
    out = np.empty(bits.size, np.uint8)
    out[~bits] = bwt0
    out[bits] = bwt1
    return out


def fm_merge(e0: FMDIndex, bwt0: np.ndarray, e1: FMDIndex, bwt1: np.ndarray,
             batch=8192) -> np.ndarray:
    """Merged BWT of the two indexes (e0's reads first, then e1's)."""
    bits = compute_gap_bits(e0, e1, batch=batch)
    return merge_bwts(bwt0, bwt1, bits)


def fm_append_streaming(old_fmd: str, new_text: np.ndarray, out_fmd: str,
                        n_threads: int = 4, sbits: int = 3):
    """Append a text block to an existing on-disk index at the reference's
    fm_append memory model (merge.c:139-209, fermi.1:253-261): the old
    index is NEVER expanded in RAM — its rank queries go through the
    mmapped .fmd.blk record cache (file-backed, evictable) and the final
    pass stream-decodes its runs straight into the RLD encoder.  Anonymous
    memory is O(block): the new block's BWT + dense rank arrays + one
    int64 position per new symbol (~18 B/sym, the reference's blk x 13
    class), plus the compressed output.  Byte-identical to the full
    fm_merge path (tested)."""
    import ctypes

    from fermi_tpu import native
    from fermi_tpu.algos.hostindex import HostIndex
    from fermi_tpu.construct import suffix
    from fermi_tpu.index.blkidx import ensure_blk
    from fermi_tpu.search.smem import _native_index_arrays

    lib = native.get_lib()
    blk0 = ensure_blk(old_fmd)
    bwt1 = suffix.multistring_bwt(np.ascontiguousarray(new_text, np.uint8))
    e1 = HostIndex(bwt1)
    blocks, occ, cnt, n_seqs1 = _native_index_arrays(e1)
    n1 = int(bwt1.size)
    pos = np.empty(n1, np.int64)
    rc = lib.fappend_gaps(
        blk0.path.encode(),
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        blocks.shape[0],
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_seqs1, blk0.n_seqs,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_threads)
    if rc:
        raise RuntimeError(f"fappend_gaps failed rc={rc}")
    lib.fappend_sort(pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                     n1, n_threads)
    bwt1 = np.ascontiguousarray(bwt1, np.uint8)
    rc = lib.fappend_interleave(
        old_fmd.encode(),
        bwt1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n1, out_fmd.encode(), sbits)
    if rc:
        raise RuntimeError(f"fappend_interleave failed rc={rc}")
