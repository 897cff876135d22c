"""Host (numpy) mirror of the blocked-occ FMD-index.

Used by host-side graph algorithms (unitig construction, scaffolding) whose
control flow is too irregular for one device program but whose interval-set
extensions are still vectorized numpy calls. Shares the exact layout of
index.fmd.FMDIndex.
"""

import numpy as np

BLOCK_BITS = 7
BLOCK = 1 << BLOCK_BITS


class HostIndex:
    def __init__(self, bwt: np.ndarray = None, _blocks=None, _n=None):
        if _blocks is not None:
            n = _n
            nb = _blocks.shape[0] - 1
            self.blocks = _blocks
        else:
            bwt = np.asarray(bwt, dtype=np.uint8)
            n = bwt.size
            nb = (n + BLOCK - 1) // BLOCK
            padded = np.full((nb + 1) * BLOCK, 6, dtype=np.uint8)
            padded[:n] = bwt
            self.blocks = padded.reshape(nb + 1, BLOCK)
        self.occ8 = None  # [nb+1, 8] contiguous, set on the native path;
        # lets the native engines borrow occ without a pad-copy
        self.occ = self._build_occ(nb)
        self.mcnt = np.zeros(7, np.int64)
        self.mcnt[0] = n
        # real symbols end before the final all-pad block, so its occ row
        # already holds the full per-symbol totals
        self.mcnt[1:] = self.occ[nb]
        self.cnt = np.zeros(7, np.int64)
        self.cnt[1:] = np.cumsum(self.mcnt[1:7])

    def _build_occ(self, nb):
        try:
            from fermi_tpu import native
            lib = native.get_lib()
        except Exception:
            lib = None
        if lib is not None:
            import ctypes
            occ8 = np.empty((nb + 1, 8), np.int64)
            lib.focc_build(
                self.blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                nb + 1,
                occ8.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 8)
            self.occ8 = occ8
            return occ8[:, :6]
        hist = np.zeros((nb + 1, 6), np.int64)
        for c in range(6):
            hist[:, c] = (self.blocks == c).sum(axis=1)
        occ = np.zeros_like(hist)
        np.cumsum(hist[:-1], axis=0, out=occ[1:])
        return occ

    @classmethod
    def from_runs(cls, runs) -> "HostIndex":
        """Build straight from RLE runs — the native path expands into the
        padded block layout in one parallel pass (no dense-BWT interim)."""
        n = int(runs.mcnt[0])
        try:
            from fermi_tpu import native
            lib = native.get_lib()
        except Exception:
            lib = None
        if lib is None or n == 0:
            return cls(runs.expand())
        import ctypes
        import os
        nb = (n + BLOCK - 1) // BLOCK
        blocks = np.empty(((nb + 1), BLOCK), np.uint8)
        syms = np.ascontiguousarray(runs.symbols, dtype=np.uint8)
        lens = np.ascontiguousarray(runs.lengths, dtype=np.int64)
        lib.fexpand_blocks(
            syms.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            syms.size, n,
            blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            nb + 1, min(os.cpu_count() or 1, 16))
        return cls(_blocks=blocks, _n=n)

    @property
    def n_seqs(self) -> int:
        return int(self.mcnt[1])

    def rank6(self, k):
        """Counts of symbols 0..5 in BWT[0..k-1]; k scalar or [B] -> [B,6]."""
        k = np.asarray(k, dtype=np.int64)
        scalar = k.ndim == 0
        k = np.atleast_1d(k)
        blk = k >> BLOCK_BITS
        off = k & (BLOCK - 1)
        rows = self.blocks[blk]                      # [B, BLOCK]
        mask = np.arange(BLOCK) < off[:, None]
        out = self.occ[blk].copy()
        for c in range(6):
            out[:, c] += ((rows == c) & mask).sum(axis=1)
        return out[0] if scalar else out

    def extend6(self, kb, kf, sz, is_back: bool):
        """Vectorized fm6_extend over interval arrays -> ([B,6],)*3."""
        kb = np.atleast_1d(np.asarray(kb, np.int64))
        kf = np.atleast_1d(np.asarray(kf, np.int64))
        sz = np.atleast_1d(np.asarray(sz, np.int64))
        primary = kb if is_back else kf
        both = self.rank6(np.concatenate([primary, primary + sz]))
        tk = both[: len(primary)]
        tl = both[len(primary):]
        osz = tl - tk
        outp = self.cnt[:6][None, :] + tk
        other_base = kf if is_back else kb
        other = np.empty_like(outp)
        other[:, 0] = other_base
        other[:, 4] = other[:, 0] + osz[:, 0]
        other[:, 3] = other[:, 4] + osz[:, 4]
        other[:, 2] = other[:, 3] + osz[:, 3]
        other[:, 1] = other[:, 2] + osz[:, 2]
        other[:, 5] = other[:, 1] + osz[:, 1]
        if is_back:
            return outp, other, osz
        return other, outp, osz

    def set_intv(self, c: int):
        comp = 5 - c if 1 <= c <= 4 else c
        return (int(self.cnt[c]), int(self.cnt[comp]),
                int(self.cnt[c + 1] - self.cnt[c]))

    def retrieve(self, x: int):
        """Sequence (forward order, nt6) of the x-th read + final rank."""
        k = int(x)
        out = []
        while True:
            r = self.rank6(np.array([k]))
            c = int(self.blocks[k >> BLOCK_BITS, k & (BLOCK - 1)])
            k = int(self.cnt[c] + r[0, c])
            if c == 0:
                return np.array(out[::-1], dtype=np.uint8), k
            out.append(c)

    def retrieve_batch(self, xs, max_len: int = 1 << 16):
        """Vectorized LF walks for many sentinel ranks at once.

        Returns (seqs: list of forward nt6 arrays, final_ranks int64[N])."""
        k = np.asarray(xs, np.int64).copy()
        n = len(k)
        done = np.zeros(n, bool)
        cols = []
        for _ in range(max_len):
            c = self.blocks[k >> BLOCK_BITS, k & (BLOCK - 1)].astype(np.int64)
            c[done] = 0
            r = self.rank6(k)
            kp = self.cnt[c] + r[np.arange(n), c]
            hit = ~done & (c == 0)
            emit = ~done & (c != 0)
            cols.append(np.where(emit, c, 0).astype(np.uint8))
            k = np.where(done, k, kp)
            done |= hit
            if done.all():
                break
        mat = np.stack(cols, axis=1) if cols else np.zeros((n, 0), np.uint8)
        seqs = []
        for i in range(n):
            row = mat[i]
            ln = int((row != 0).sum())
            seqs.append(row[:ln][::-1].copy())
        return seqs, k
