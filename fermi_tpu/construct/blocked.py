"""Blocked device BWT construction: wsort blocks + device gap-bit merge.

The reference scales index construction by splitting the read stream into
blocks, building each block's BWT independently, and appending/merging
(run-fermi.pl:108-121 splitfa -> build x N -> merge; fm_append at
merge.c:139-209).  This module is that path made device-native:

  * each block's multi-string BWT is ONE stable multi-key lax.sort over
    packed symbol windows (construct/wsort.py) — HBM working set
    ~(ceil(Lmax/10)+2)*4 bytes per block symbol, so the block size caps
    device memory no matter how large the input;
  * blocks are folded left-to-right with the batched gap-bit merge
    (algos/merge.py = merge.c:21-137 as device LF/rank walks), which costs
    O(block symbols) rank queries per fold plus a host interleave.

Sentinel (= read) order is preserved because blocks partition the read
stream in order and the merge appends e1's reads after e0's — identical to
the reference's fm_append contract (merge.c:175).

The result is byte-identical to the host SA path at any block size, and the
working set never exceeds one block's sort plus two indexes, so texts far
beyond the whole-text-sort limit build on one chip.
"""

import numpy as np

from fermi_tpu.construct import wsort
from fermi_tpu.index.fmd import FMDIndex


def _block_slices(lens: np.ndarray, block_symbols: int):
    """Partition reads (in order) into blocks of <= block_symbols total
    symbols (incl. sentinels); a single oversized read gets its own block."""
    out = []
    start, acc = 0, 0
    for i, ln in enumerate(lens):
        sym = int(ln) + 1
        if acc and acc + sym > block_symbols:
            out.append((start, i))
            start, acc = i, 0
        acc += sym
    if acc:
        out.append((start, len(lens)))
    return out


def device_build_bwt(seqs: list[np.ndarray], block_symbols: int = 40 << 20,
                     merge_batch: int = 8192, progress=None) -> np.ndarray:
    """Multi-string BWT of nt6 reads (already strand-expanded, in final
    sentinel order), built on-device in blocks.  Byte-identical to
    construct.suffix.multistring_bwt over the same text."""
    if not seqs:
        return np.zeros(0, np.uint8)
    lens = np.array([len(s) for s in seqs], np.int64)
    if (lens == 0).any():
        raise ValueError("empty read")
    max_len = int(lens.max())
    blocks = _block_slices(lens, block_symbols)

    from fermi_tpu.algos import merge as mg

    acc_bwt = None
    acc_idx = None
    for bi, (lo, hi) in enumerate(blocks):
        text = np.concatenate(
            [np.concatenate([s, [0]]) for s in seqs[lo:hi]]).astype(np.uint8)
        bwt = wsort.wsort_bwt(text, max_read_len=max_len)
        if progress:
            progress(f"block {bi + 1}/{len(blocks)}: {text.size / 1e6:.1f}M "
                     f"symbols sorted")
        if acc_bwt is None:
            acc_bwt = bwt
            if len(blocks) > 1:
                acc_idx = FMDIndex.from_bwt(bwt)
            continue
        e1 = FMDIndex.from_bwt(bwt)
        bits = mg.compute_gap_bits(acc_idx, e1, batch=merge_batch)
        acc_bwt = mg.merge_bwts(acc_bwt, bwt, bits)
        if bi < len(blocks) - 1:
            acc_idx = FMDIndex.from_bwt(acc_bwt)
        else:
            acc_idx = None
        if progress:
            progress(f"block {bi + 1}/{len(blocks)}: merged -> "
                     f"{acc_bwt.size / 1e6:.1f}M symbols")
    return acc_bwt


def device_build_text(text: np.ndarray, block_symbols: int = 40 << 20,
                      merge_batch: int = 8192, progress=None) -> np.ndarray:
    """device_build_bwt over an already-concatenated sentinel-terminated
    text (the driver's native path hands reads in this form)."""
    text = np.asarray(text, np.uint8)
    if text.size == 0:
        return np.zeros(0, np.uint8)
    assert text[-1] == 0
    if text.size <= block_symbols:
        return wsort.wsort_bwt(text)
    ends = np.flatnonzero(text == 0)
    starts = np.concatenate([[0], ends[:-1] + 1])
    seqs = [text[s:e] for s, e in zip(starts, ends)]
    return device_build_bwt(seqs, block_symbols, merge_batch, progress)
