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

    def tree_flatten(self):
        return (self.bwt_blocks, self.occ, self.cnt, self.mcnt), None

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
        dtype = np.int32 if n < 2**31 - BLOCK else np.int64
        return FMDIndex(
            bwt_blocks=jnp.asarray(blocks),
            occ=jnp.asarray(occ.astype(dtype)),
            cnt=jnp.asarray(cnt.astype(dtype)),
            mcnt=jnp.asarray(mcnt.astype(dtype)),
        )

    @staticmethod
    def from_runs(runs) -> "FMDIndex":
        return FMDIndex.from_bwt(runs.expand())

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
        """Counts of symbols 0..5 in BWT[0..k-1]. k: int [B] -> [B, 6].

        The count runs in [B, 6, BLOCK] layout: the minor dim is the full
        128-symbol block (one VPU lane row), the 6-symbol dim pads only to
        the 8 sublanes. The transposed [B, BLOCK, 6] form puts 6 in the
        128-lane minor position and runs ~20x below peak (measured on the
        v5e: the whole SMEM kernel was compute-bound on this count)."""
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
