"""B+-rope incremental builder (reference bprope6.c semantics).

Fourth independent BWT construction path, kept for the reference's
strongest QA idea: interchangeable builders must agree bit-for-bit
(fermi.1:581-628; SURVEY §4.5).  Insertion order defines sentinel order,
matching bpr_insert_string (bprope6.c:219-226); the rope itself is a fresh
counted B+-tree in native/bprope.cpp.
"""

import ctypes

import numpy as np


def bpr_bwt(seqs: list[np.ndarray]) -> np.ndarray:
    """Multi-string BWT of nt6 reads (no sentinels in input), built by
    incremental rope insertion; equals construct.suffix.multistring_bwt of
    the same reads in the same order."""
    from fermi_tpu import native

    lib = native.get_lib()
    n = len(seqs)
    offsets = np.zeros(n + 1, np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = (np.concatenate([np.asarray(s, np.uint8) for s in seqs])
            if n else np.zeros(0, np.uint8))
    flat = np.ascontiguousarray(flat)
    out = np.empty(int(offsets[-1]) + n, np.uint8)
    total = lib.fbpr_build(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert total == out.size, (total, out.size)
    return out
