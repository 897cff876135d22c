"""ctypes loader for the native host-side library (RLD codec etc.).

The library is built on demand with the Makefile in this directory and cached
in native/build/. Native code covers the inherently serial, byte-exact pieces
(the on-disk RLD\\2 codec); all compute-heavy work lives in JAX/Pallas.
"""

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
# FERMI_TPU_NATIVE_LIB overrides the library path — used by the TSAN CI test
# (tests/test_native_tsan.py) to load the -fsanitize=thread build instead.
_LIB_PATH = os.environ.get(
    "FERMI_TPU_NATIVE_LIB",
    os.path.join(_HERE, "build", "libfermi_native.so"))
_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(["make", "-s", "-C", _HERE], check=True)


def _sources_newer() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for fn in os.listdir(_HERE):
        if fn.endswith((".cpp", ".h")) and os.path.getmtime(os.path.join(_HERE, fn)) > lib_mtime:
            return True
    return False


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            if _sources_newer():
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.frld_encode_file.restype = ctypes.c_int
            lib.frld_encode_file.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_char_p,
            ]
            lib.frld_decode_file.restype = ctypes.c_int
            lib.frld_decode_file.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.frld_free.restype = None
            lib.frld_free.argtypes = [ctypes.c_void_p]
            lib.fec_create.restype = ctypes.c_void_p
            lib.fec_create.argtypes = [
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fec_destroy.restype = None
            lib.fec_destroy.argtypes = [ctypes.c_void_p]
            lib.fec_fix.restype = ctypes.c_uint64
            lib.funitig_run.restype = ctypes.c_void_p
            lib.funitig_run.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_void_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.funitig_stitch.restype = ctypes.c_void_p
            lib.funitig_stitch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # blocks
                ctypes.POINTER(ctypes.c_int64),   # occ
                ctypes.c_int64,                   # n_rows
                ctypes.POINTER(ctypes.c_int64),   # cnt
                ctypes.c_int64,                   # n_seqs
                ctypes.c_int,                     # min_match
                ctypes.c_void_p,                  # sorted
                ctypes.POINTER(ctypes.c_uint8),   # seq_flat
                ctypes.POINTER(ctypes.c_int64),   # seq_offs
                ctypes.POINTER(ctypes.c_int64),   # own_ks
                ctypes.POINTER(ctypes.c_uint8),   # valid
                ctypes.POINTER(ctypes.c_int8),    # ret
                ctypes.POINTER(ctypes.c_int64),   # intv0
                ctypes.POINTER(ctypes.c_uint8),   # has_ovlp
                ctypes.c_void_p,                  # nkb
                ctypes.c_void_p,                  # nkf
                ctypes.c_void_p,                  # nsz
                ctypes.POINTER(ctypes.c_int32),   # nov
                ctypes.POINTER(ctypes.c_int32),   # nex
                ctypes.POINTER(ctypes.c_int32),   # nein
                ctypes.c_int,                     # nmax
                ctypes.c_void_p,                  # skb
                ctypes.c_void_p,                  # skf
                ctypes.c_void_p,                  # ssz
                ctypes.POINTER(ctypes.c_int32),   # sbn
                ctypes.c_int,                     # sbmax
                ctypes.POINTER(ctypes.c_uint8),   # redo
                ctypes.c_int,                     # idt64
                ctypes.POINTER(ctypes.c_int64),   # out_len
                ctypes.POINTER(ctypes.c_int64),   # n_recover
            ]
            lib.fsmem_all.restype = ctypes.POINTER(ctypes.c_int64)
            lib.fsmem_all.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fec_collect.restype = ctypes.POINTER(ctypes.c_int64)
            lib.fec_collect.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.ffastq_frags.restype = ctypes.c_int64
            lib.ffastq_frags.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fappend_gaps.restype = ctypes.c_int
            lib.fappend_gaps.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int,
            ]
            lib.fappend_sort.restype = None
            lib.fappend_sort.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int]
            lib.fappend_interleave.restype = ctypes.c_int
            lib.fappend_interleave.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            # out-of-core (.fmd.blk mmapped record cache) variants
            lib.fmblk_build.restype = ctypes.c_int
            lib.fmblk_build.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
            lib.fmblk_info.restype = ctypes.c_int
            lib.fmblk_info.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
            lib.funitig_run_blk.restype = ctypes.c_void_p
            lib.funitig_run_blk.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
            lib.fsmem_all_blk.restype = ctypes.POINTER(ctypes.c_int64)
            lib.fsmem_all_blk.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fec_collect_blk.restype = ctypes.POINTER(ctypes.c_int64)
            lib.fec_collect_blk.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64)]
            lib.fseqsort_blk.restype = ctypes.c_int
            lib.fseqsort_blk.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int]
            lib.fsa_prewarm.restype = None
            lib.fsa_prewarm.argtypes = [ctypes.c_int64, ctypes.c_int]
            lib.fsa_build.restype = ctypes.c_int
            lib.fsa_build.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int,
            ]
            lib.fsa_bwt.restype = ctypes.c_int
            lib.fsa_bwt.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
            lib.fbuild_text.restype = ctypes.c_int64
            lib.fbuild_text.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.fbcr_build.restype = ctypes.c_int64
            lib.fbcr_build.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
            lib.fbpr_build.restype = ctypes.c_int64
            lib.fbpr_build.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.fflt_keep.restype = ctypes.c_int
            lib.fflt_keep.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
            lib.fexpand_blocks.restype = None
            lib.fexpand_blocks.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int,
            ]
            lib.focc_build.restype = None
            lib.focc_build.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int,
            ]
            lib.fpack_build.restype = None
            lib.fpack_build.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
            ]
            lib.fbcr_start_text.restype = ctypes.c_void_p
            lib.fbcr_start_text.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fbcr_emit_runs.restype = None
            lib.fbcr_emit_runs.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fencode_frags.restype = ctypes.c_int64
            lib.fencode_frags.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ]
            lib.fbcr_start_frags.restype = ctypes.c_void_p
            lib.fbcr_start_frags.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fbuild_text_ascii.restype = ctypes.c_int64
            lib.fbuild_text_ascii.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.fspans_extract.restype = None
            lib.fspans_extract.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
            lib.fpaircov_create.restype = ctypes.c_void_p
            lib.fpaircov_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
            lib.fpaircov_stats.restype = None
            lib.fpaircov_stats.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
            lib.fpaircov_destroy.restype = None
            lib.fpaircov_destroy.argtypes = [ctypes.c_void_p]
            lib.fpaircov_batch.restype = ctypes.c_int64
            lib.fpaircov_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fseqsort.restype = None
            lib.fseqsort.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int,
            ]
            lib.frle_count.restype = ctypes.c_int64
            lib.frle_count.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
            ]
            lib.frle_from_bwt.restype = ctypes.c_int64
            lib.frle_from_bwt.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fec_fix.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
            ]
            lib.frld_enc_open.restype = ctypes.c_void_p
            lib.frld_enc_open.argtypes = [ctypes.c_int, ctypes.c_int]
            lib.frld_enc_put.restype = None
            lib.frld_enc_put.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
            ]
            lib.frld_enc_finish.restype = ctypes.c_int
            lib.frld_enc_finish.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.fmmap_open.restype = ctypes.c_void_p
            lib.fmmap_open.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
            lib.fmmap_close.restype = None
            lib.fmmap_close.argtypes = [ctypes.c_void_p]
            lib.fmmap_rank6.restype = None
            lib.fmmap_rank6.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int,
            ]
            _lib = lib
    return _lib


def adopt_array(ptr, count, dtype):
    """Wrap a malloc'd buffer returned by the native lib as a numpy array
    WITHOUT copying; the buffer is frld_free'd when the array (and every
    view of it) is garbage-collected."""
    import weakref

    import numpy as np

    lib = get_lib()
    nbytes = int(count) * np.dtype(dtype).itemsize
    addr = ctypes.cast(ptr, ctypes.c_void_p).value
    buf = (ctypes.c_uint8 * nbytes).from_address(addr)
    weakref.finalize(buf, lib.frld_free, ctypes.c_void_p(addr))
    return np.frombuffer(buf, dtype=dtype)
