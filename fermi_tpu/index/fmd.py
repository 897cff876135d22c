"""Device-resident FMD-index: dense blocked-occ layout for batched rank queries.

The reference keeps its BWT delta-compressed in memory and pays a pointer-walk
per rank (/root/reference/rld.c:352-446). On TPU we invert the layout: the BWT
lives in HBM as dense symbol blocks plus per-block exclusive cumulative counts,
so rank(k) for thousands of query positions is one gather + masked popcount —
ideal for the VPU, no decode on the query path. The compressed form exists only
on disk (see fermi_tpu.rld).

Conventions (differ deliberately from the reference):
  rank6(k)[c]  = #occurrences of symbol c in BWT[0..k-1]   (standard exclusive)
  sym_at(k)    = BWT[k]
The reference's rld_rank1a(k) = (sym_at(k), rank6(k+1)); call sites adapt.
"""

from dataclasses import dataclass, field
from functools import partial

import numpy as np

from fermi_tpu import jaxcfg  # noqa: F401  (x64 + compile cache, must precede tracing)

import jax
import jax.numpy as jnp

BLOCK_BITS = 7
BLOCK = 1 << BLOCK_BITS  # 128 symbols per occ block

_NIB1 = 0x11111111  # bit0 of every nibble


def _pallas_rank_mode() -> str:
    """Rank-kernel dispatch: '1' = Pallas (TPU), 'interp' = Pallas
    interpreter (CPU tests), '0' = fused XLA SWAR.  FERMI_TPU_PALLAS_RANK
    overrides; default 'auto' picks Pallas on TPU-class backends and XLA
    SWAR on CPU."""
    import os

    mode = os.environ.get("FERMI_TPU_PALLAS_RANK", "auto")
    if mode != "auto":
        return mode
    return "1" if jax.default_backend() not in ("cpu",) else "0"


def _pick_idtype(n: int):
    """Index integer domain for a total length of n symbols.

    int32 while everything fits; uint32 up to 4 Gsym (kb/kf/occ values are
    nonnegative counts, and the TPU emulates int64 — the 2 Gsym SMEM bench
    ran ~int64-emulation-bound AND lost the fused rank row, which requires
    32-bit occ); int64 beyond.  FERMI_TPU_IDX_DTYPE forces a domain (tests
    exercise the uint32 kernels on small indexes this way)."""
    import os

    mode = os.environ.get("FERMI_TPU_IDX_DTYPE", "auto")
    if mode != "auto":
        return {"int32": np.int32, "uint32": np.uint32,
                "int64": np.int64}[mode]
    if n < 2**31 - BLOCK:
        return np.int32
    if n < 2**32 - BLOCK:
        return np.uint32
    return np.int64


def _swar_rank_count(words: jnp.ndarray, off: jnp.ndarray) -> jnp.ndarray:
    """Per-symbol prefix counts within one 128-symbol block.

    words: int32 [..., 16] nibble-packed symbols; off: int32 [...] prefix
    length in [0, 128].  Returns int32 [..., 6].

    Pure int32 SWAR (shared verbatim by the Pallas kernel, which cannot use
    sub-32-bit vectors): symbol c's count per word = number of zero nibbles
    of words ^ (c * 0x11111111), restricted to nibbles below the query
    offset; zero-nibble marks are summed with the * 0x11111111 >> 28 trick.
    Nibble values are <= 6 and patterns <= 5, so xor nibbles are <= 7 and
    no bit3 carries occur."""
    i32 = jnp.int32
    jpos = (jnp.arange(16, dtype=i32) * 8)
    # allowed nibbles of word j: t = clamp(off - 8j, 0, 8) low nibbles
    t = jnp.clip(off[..., None] - jpos, 0, 8)
    allowed = jnp.where(t >= 8, i32(_NIB1),
                        ((i32(1) << (4 * jnp.minimum(t, 7))) - 1) & _NIB1)
    outs = []
    for c in range(6):
        x = words ^ i32(c * _NIB1)
        nz = (x | (x >> 1) | (x >> 2) | (x >> 3)) & _NIB1
        zeros = (~nz) & allowed
        per_word = ((zeros * i32(_NIB1)) >> 28) & 15
        outs.append(jnp.sum(per_word, axis=-1, dtype=i32))
    return jnp.stack(outs, axis=-1)


def _fuse_rows(packed_i32: np.ndarray, occ: np.ndarray) -> jnp.ndarray:
    """[NB, 24] i32 fused rank rows: packed words + occ6 + pad (see the
    FMDIndex.fused field comment).  occ values are stored as their 32-bit
    pattern (uint32-domain indexes reinterpret on gather), so any occ that
    fits 32 bits fuses."""
    nb = packed_i32.shape[0]
    fused = np.zeros((nb, 24), np.int32)
    fused[:, :16] = packed_i32
    fused[:, 16:22] = (occ[:, :6] & 0xFFFFFFFF).astype(np.uint32) \
        .view(np.int32)
    return jnp.asarray(fused)


@jax.tree_util.register_pytree_node_class
@dataclass
class FMDIndex:
    """Bidirectional FM-index over nt6 alphabet, device arrays.

    bwt_blocks: uint8 [n_blocks+1, BLOCK], padded with 6 (never counted)
    occ:        int   [n_blocks+1, 8]  exclusive cumulative counts per block
                (cols 6,7 are padding for lane alignment)
    cnt:        int   [8]  C-array: cnt[c] = #symbols < c in the whole BWT
    mcnt:       int   [8]  mcnt[0]=total, mcnt[1+c]=count of symbol c
    """

    bwt_blocks: jnp.ndarray
    occ: jnp.ndarray
    cnt: jnp.ndarray
    mcnt: jnp.ndarray
    bwt_packed: jnp.ndarray = None  # int32 [n_blocks+1, 16], 8 nibbles/word
    # fused rank row [n_blocks+1, 24] i32: cols 0..15 the packed words,
    # 16..21 the occ counts, 22..23 pad.  TPU gathers cost ~15 ns per ROW
    # regardless of row bytes (measured: 8/16/128-col rows all ~15 ns), so
    # one fused gather halves the rank battery's row count vs separate
    # packed+occ gathers.  int32-index domain only (occ must fit i32).
    fused: jnp.ndarray = None

    def tree_flatten(self):
        return (self.bwt_blocks, self.occ, self.cnt, self.mcnt,
                self.bwt_packed, self.fused), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_bwt(bwt: np.ndarray, device=None) -> "FMDIndex":
        bwt = np.asarray(bwt, dtype=np.uint8)
        n = bwt.size
        n_blocks = (n + BLOCK - 1) // BLOCK
        padded = np.full((n_blocks + 1) * BLOCK, 6, dtype=np.uint8)
        padded[:n] = bwt
        blocks = padded.reshape(n_blocks + 1, BLOCK)
        # per-block symbol histogram -> exclusive cumsum
        hist = np.zeros((n_blocks + 1, 8), dtype=np.int64)
        for c in range(6):
            hist[:, c] = (blocks == c).sum(axis=1)
        occ = np.zeros_like(hist)
        np.cumsum(hist[:-1], axis=0, out=occ[1:])
        mcnt = np.zeros(8, dtype=np.int64)
        mcnt[0] = n
        mcnt[1:7] = np.bincount(bwt, minlength=6)[:6]
        cnt = np.zeros(8, dtype=np.int64)
        cnt[1:7] = np.cumsum(mcnt[1:7])
        cnt[7] = cnt[6]
        dtype = _pick_idtype(n)
        # nibble-packed blocks: 8 symbols per int32 word, symbol at block
        # offset j*8+s lives in nibble s of word j.  Max nibble value is 6,
        # so words stay positive in int32.  Halves rank-gather rows to 64 B
        # and feeds the SWAR rank count (see rank6) and the Pallas kernel.
        w = blocks.astype(np.uint32).reshape(n_blocks + 1, 16, 8)
        packed = np.zeros((n_blocks + 1, 16), np.uint32)
        for s in range(8):
            packed |= w[:, :, s] << (4 * s)
        packed = packed.astype(np.int32)
        return FMDIndex(
            bwt_blocks=jnp.asarray(blocks),
            occ=jnp.asarray(occ.astype(dtype)),
            cnt=jnp.asarray(cnt.astype(dtype)),
            mcnt=jnp.asarray(mcnt.astype(dtype)),
            bwt_packed=jnp.asarray(packed),
            fused=_fuse_rows(packed, occ) if dtype != np.int64 else None,
        )

    @staticmethod
    def from_runs(runs) -> "FMDIndex":
        """Device index straight from RLE runs.

        Native fast path: expand runs into padded blocks, occ, and the
        nibble-packed rank words in three threaded C passes (the numpy
        route — np.full copy, six compare-sum sweeps, an 8-shift pack
        loop — cost ~34 s at 200 Msym; the transfers are ~5 s)."""
        n = int(np.asarray(runs.mcnt[0]))
        try:
            from fermi_tpu import native
            lib = native.get_lib()
        except Exception:
            lib = None
        if lib is None or n == 0:
            return FMDIndex.from_bwt(runs.expand())
        import ctypes
        import os
        T = min(os.cpu_count() or 1, 16)
        nb = (n + BLOCK - 1) // BLOCK
        blocks = np.empty((nb + 1, BLOCK), np.uint8)
        syms = np.ascontiguousarray(runs.symbols, dtype=np.uint8)
        lens = np.ascontiguousarray(runs.lengths, dtype=np.int64)
        lib.fexpand_blocks(
            syms.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            syms.size, n,
            blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            nb + 1, T)
        occ8 = np.empty((nb + 1, 8), np.int64)
        lib.focc_build(
            blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            nb + 1,
            occ8.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 8)
        packed = np.empty((nb + 1, 16), np.int32)
        lib.fpack_build(
            blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            nb + 1,
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), T)
        # the final row is all pad, so occ8[nb] holds the full totals
        mcnt = np.zeros(8, dtype=np.int64)
        mcnt[0] = n
        mcnt[1:7] = occ8[nb, :6]
        cnt = np.zeros(8, dtype=np.int64)
        cnt[1:7] = np.cumsum(mcnt[1:7])
        cnt[7] = cnt[6]
        dtype = _pick_idtype(n)
        idx = FMDIndex(
            bwt_blocks=jnp.asarray(blocks),
            occ=jnp.asarray(occ8.astype(dtype)),
            cnt=jnp.asarray(cnt.astype(dtype)),
            mcnt=jnp.asarray(mcnt.astype(dtype)),
            bwt_packed=jnp.asarray(packed),
            fused=_fuse_rows(packed, occ8) if dtype != np.int64 else None,
        )
        # pre-seed the native-engine cache (search.smem._native_index_arrays)
        idx._native_arrays = (blocks, occ8, cnt, int(mcnt[1]))
        return idx

    @staticmethod
    def restore(path: str) -> "FMDIndex":
        from fermi_tpu import rld
        return FMDIndex.from_runs(rld.read_fmd(path))

    # -- properties --------------------------------------------------------

    @property
    def total(self):
        return self.mcnt[0]

    @property
    def n_seqs(self):
        return self.mcnt[1]

    @property
    def idtype(self):
        return self.occ.dtype

    # -- core queries (all batched over leading axis) ----------------------

    def rank6(self, k: jnp.ndarray) -> jnp.ndarray:
        """Counts of symbols 0..5 in BWT[0..k-1]. k: int [...] -> [..., 6].

        Default path: SWAR count over the nibble-packed blocks — the gather
        row is 64 B and the per-symbol count is ~8 int32 ops per word plus a
        16-lane reduce, with no [.., 6, BLOCK] one-hot intermediate (the
        dense one-hot count materialized ~50 MB/extend6 in HBM at B=2048
        and bounded the round-1 SMEM kernel; BENCH_NOTES.md)."""
        if self.bwt_packed is None:
            return self.rank6_dense(k)
        k = k.astype(self.idtype)
        blk = k >> BLOCK_BITS
        off = (k & (BLOCK - 1)).astype(jnp.int32)
        if self.fused is not None:
            row = self.fused[blk]                         # [..., 24] int32
            words = row[..., :16]
            base = row[..., 16:22].astype(self.idtype)
        else:
            words = self.bwt_packed[blk]                  # [..., 16] int32
            base = self.occ[blk][..., :6]                 # [..., 6]
        mode = _pallas_rank_mode()
        if mode != "0":
            from fermi_tpu.ops import rank_pallas
            shp = words.shape[:-1]
            cnts = rank_pallas.rank_block_counts(
                words.reshape(-1, 16), off.reshape(-1),
                interpret=(mode == "interp"))
            within = cnts[:, :6].reshape(*shp, 6)
        else:
            within = _swar_rank_count(words, off)
        return base + within.astype(self.idtype)

    def rank6_dense(self, k: jnp.ndarray) -> jnp.ndarray:
        """One-hot count over the uint8 blocks (fallback/oracle path).

        Count runs in [B, 6, BLOCK] layout: the minor dim is the full
        128-symbol block (one VPU lane row), the 6-symbol dim pads only to
        the 8 sublanes (the transposed form ran ~20x below peak)."""
        k = k.astype(self.idtype)
        blk = k >> BLOCK_BITS
        off = k & (BLOCK - 1)
        rows = self.bwt_blocks[blk]                       # [B, BLOCK]
        base = self.occ[blk][..., :6]                     # [B, 6]
        pos_ok = (jnp.arange(BLOCK, dtype=jnp.int32)
                  < off[..., None, None])                 # [B, 1, BLOCK]
        eq = (rows[..., None, :]
              == jnp.arange(6, dtype=jnp.uint8)[:, None])  # [B, 6, BLOCK]
        within = jnp.sum(eq & pos_ok, axis=-1, dtype=self.idtype)
        return base + within

    def sym_at(self, k: jnp.ndarray) -> jnp.ndarray:
        """BWT[k] (uint8). k: int [B] -> [B]."""
        k = k.astype(self.idtype)
        return self.bwt_blocks[k >> BLOCK_BITS, k & (BLOCK - 1)]

    def rank1_sym(self, k: jnp.ndarray):
        """(BWT[k], rank6(k)) — the pair used by LF walks."""
        return self.sym_at(k), self.rank6(k)

    def lf(self, k: jnp.ndarray):
        """One LF-mapping step: (symbol at k, predecessor position).

        Matches reference fm_retrieve's inner step (exact.c:59-70):
        k' = cnt[c] + rank_c([0..k]) - 1 = cnt[c] + rank6(k)[c] for c=BWT[k].
        """
        c, r = self.rank1_sym(k)
        ci = c.astype(jnp.int32)
        kp = self.cnt[ci] + jnp.take_along_axis(r, ci[..., None], axis=-1)[..., 0]
        return c, kp

    def extend6(self, kb, kf, sz, is_back: bool):
        """Batched fm6_extend (exact.c:72-88): extend bi-intervals by every
        symbol at once.

        kb, kf, sz: int [B] — interval start (backward strand), start (forward
        strand), size. Returns (KB, KF, SZ): each [B, 6], one column per symbol.
        """
        primary = kb if is_back else kf
        tk = self.rank6(primary)                # [B, 6]
        tl = self.rank6(primary + sz)
        osz = tl - tk
        out_primary = self.cnt[:6] + tk
        # opposite-strand starts via the complement-ordering identity:
        # symbols on the other strand appear in the order 0,4,3,2,1,5
        other_base = kf if is_back else kb
        o0 = other_base
        o4 = o0 + osz[..., 0]
        o3 = o4 + osz[..., 4]
        o2 = o3 + osz[..., 3]
        o1 = o2 + osz[..., 2]
        o5 = o1 + osz[..., 1]
        other = jnp.stack([o0, o1, o2, o3, o4, o5], axis=-1)
        if is_back:
            return out_primary, other, osz
        return other, out_primary, osz

    def set_intv(self, c: jnp.ndarray):
        """Initial bi-interval of a single symbol c (fm6_set_intv)."""
        ci = c.astype(jnp.int32)
        comp = jnp.where((ci >= 1) & (ci <= 4), 5 - ci, ci)
        kb = self.cnt[ci]
        sz = self.cnt[ci + 1] - self.cnt[ci]
        kf = self.cnt[comp]
        return kb, kf, sz
