"""Index subsetting (reference sub.c): build the sub-index containing only
selected reads.

Every selected read's LF-walk positions are collected with batched device
walks (chunked, like merge's gap walks); filtering the BWT by the resulting
bit mask is a numpy boolean index over the expanded symbols, then the RLD
encoder re-compresses.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from fermi_tpu.index.fmd import FMDIndex


@partial(jax.jit, static_argnames=("steps",))
def _walk_chunk(e: FMDIndex, k, done, steps: int):
    """Advance LF walks by `steps`, emitting visited positions (pre-step k)."""
    B = k.shape[0]
    pos = jnp.full((B, steps), -1, dtype=jnp.int64)

    def body(step, carry):
        k, done, pos = carry
        pos = pos.at[:, step].set(jnp.where(done, -1, k.astype(jnp.int64)))
        c, kp = e.lf(k)
        hit_end = c == 0
        k = jnp.where(done | hit_end, k, kp)
        done = done | hit_end
        return k, done, pos

    k, done, pos = jax.lax.fori_loop(0, steps, body, (k, done, pos))
    return k, done, pos


def mark_read_positions(e: FMDIndex, seq_ids: np.ndarray, n_total: int,
                        batch=8192, chunk_steps=128) -> np.ndarray:
    """bool[n_total] with True at every BWT position on a selected read's
    LF cycle (including its sentinel position)."""
    bits = np.zeros(n_total, bool)
    idt = e.idtype
    for lo in range(0, len(seq_ids), batch):
        chunk = seq_ids[lo: lo + batch]
        m = len(chunk)
        k = jnp.asarray(np.pad(chunk, (0, batch - m)).astype(idt))
        done = jnp.zeros(batch, bool) | (jnp.arange(batch) >= m)
        while True:
            k, done, pos = _walk_chunk(e, k, done, chunk_steps)
            p = np.asarray(pos).ravel()
            p = p[p >= 0]
            if p.size:
                bits[p] = True
            if bool(np.asarray(jnp.all(done))):
                break
            # note: the final sentinel position emits on the step where c==0
    return bits


def fm_sub(e: FMDIndex, bwt: np.ndarray, sub_bits: np.ndarray,
           is_comp=False) -> np.ndarray:
    """Sub-index BWT: keep positions of reads whose bit is set in sub_bits
    (seq-id space), complemented with is_comp."""
    n_seqs = int(np.asarray(e.mcnt[1]))
    ids = np.flatnonzero(sub_bits[:n_seqs])
    marked = mark_read_positions(e, ids.astype(np.int64), bwt.size)
    keep = marked if not is_comp else ~marked
    return bwt[keep]


def unpack_bitfile(path: str):
    """Read the <n_seqs><bits> binary bit-array format (cmd.c:702-715)."""
    raw = np.fromfile(path, np.uint64)
    n = int(raw[0])
    words = raw[1: 1 + (n + 63) // 64]
    bits = np.unpackbits(words.view(np.uint8), bitorder="little")[:n]
    return bits.astype(bool)


def pack_bitfile(path_or_fp, bits: np.ndarray):
    n = len(bits)
    words = np.packbits(bits.astype(np.uint8), bitorder="little")
    pad = (n + 63) // 64 * 8 - len(words)
    data = np.concatenate([words, np.zeros(pad, np.uint8)])
    out = np.concatenate([np.array([n], np.uint64).view(np.uint8), data])
    if hasattr(path_or_fp, "write"):
        path_or_fp.write(out.tobytes())
    else:
        out.tofile(path_or_fp)
