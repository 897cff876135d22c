"""Out-of-core FMD-index handle over a blocked record cache (.fmd.blk).

The reference runs every command off the mmapped compressed index with `-M`
(rld_restore_mmap, rld.c:327-346; cmd.c:54-69).  The rebuild's native
engines use a dense interleaved record layout (fmindex.h) instead of the
compressed blocks, so the `-M` equivalent here is a one-time streaming
conversion of the .fmd into a `.fmd.blk` sidecar (fmblk_build, bounded
RSS), which every engine then mmaps read-only with MADV_RANDOM: the index
can be several times larger than RAM, and RSS stays bounded by the pages
the walks actually touch.

`BlkIndex` is a lightweight handle (path + header metadata) accepted by the
native engine wrappers (smem_all_native / seqsort_native / fm6_unitig_native
/ collect_solid_kmers_native) in place of a resident index.
"""

import ctypes
import os

import numpy as np

from fermi_tpu import native


class BlkIndex:
    """Handle to a .fmd.blk record cache; engines mmap it on use."""

    def __init__(self, blk_path: str):
        lib = native.get_lib()
        info = np.zeros(12, np.int64)
        rc = lib.fmblk_info(blk_path.encode(),
                            info.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if rc:
            raise OSError(f"not a .fmd.blk cache: {blk_path} (rc={rc})")
        self.path = blk_path
        self.n_rows = int(info[0])
        self._total = int(info[1])
        self._n_seqs = int(info[2])
        self.wide = bool(info[3])
        self.cnt = info[4:12].copy()
        # mcnt[0]=total, mcnt[1]=#sequences — enough for the engine wrappers
        self.mcnt = np.array([self._total, self._n_seqs, 0, 0, 0, 0, 0],
                             np.int64)

    @property
    def total(self):
        return self._total

    @property
    def n_seqs(self):
        return self._n_seqs


def ensure_blk(fmd_path: str, blk_path: str | None = None,
               n_threads: int | None = None) -> BlkIndex:
    """Build the .fmd.blk sidecar if missing or older than the .fmd, then
    return a BlkIndex handle."""
    blk_path = blk_path or fmd_path + ".blk"
    fresh = (os.path.exists(blk_path)
             and os.path.getmtime(blk_path) >= os.path.getmtime(fmd_path))
    if not fresh:
        lib = native.get_lib()
        t = n_threads or min(os.cpu_count() or 1, 8)
        rc = lib.fmblk_build(fmd_path.encode(), blk_path.encode(), t)
        if rc:
            raise OSError(f"fmblk_build({fmd_path}) failed rc={rc}")
    return BlkIndex(blk_path)
