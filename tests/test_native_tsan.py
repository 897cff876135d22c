"""ThreadSanitizer CI pass over the threaded native engines.

The reference's only concurrency-safety story is "by construction" (atomics +
spin-CAS, SURVEY.md §5); this repo promises TSAN coverage for its five
std::thread engines (construct.cpp, ec.cpp, smem.cpp, unitig.cpp,
sequtil.cpp).  The test builds the -fsanitize=thread variant of the library
and drives the threaded entry points in a subprocess with
``TSAN_OPTIONS=halt_on_error=1`` so any reported race fails the test.
"""

import os
import shutil
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
NATIVE = os.path.join(REPO, "fermi_tpu", "native")
TSAN_LIB = os.path.join(NATIVE, "build", "libfermi_native_tsan.so")

DRIVER = r"""
# NOTE: deliberately jax-free — TSAN sees false positives inside the
# uninstrumented jaxlib runtime; this driver exercises only the native
# threaded engines over numpy buffers.
import ctypes
import sys

import numpy as np

from fermi_tpu.construct import suffix
from fermi_tpu.algos.hostindex import HostIndex
from fermi_tpu.algos import pykhash  # noqa: F401 (no jax)
from fermi_tpu import native

rng = np.random.default_rng(7)
genome = rng.integers(1, 5, 20000).astype(np.uint8)
reads = []
for _ in range(1500):
    p = rng.integers(0, genome.size - 100)
    reads.append(genome[p:p + 100].copy())

# threaded SA build + BWT (construct.cpp)
text = suffix.build_text(reads)
bwt = suffix.multistring_bwt(text)
index = HostIndex(bwt)

lib = native.get_lib()
blocks = np.ascontiguousarray(index.blocks)
occ = index.occ8
if occ is None:
    occ = np.zeros((index.occ.shape[0], 8), np.int64)
    occ[:, :6] = index.occ
occ = np.ascontiguousarray(occ)
cnt = np.zeros(8, np.int64)
cnt[: len(index.cnt)] = index.cnt
n_seqs = int(index.mcnt[1])

# threaded SMEM engine (smem.cpp fsmem_all)
qs = reads[:200]
offsets = np.zeros(len(qs) + 1, np.int64)
for i, q in enumerate(qs):
    offsets[i + 1] = offsets[i] + len(q)
qbuf = np.ascontiguousarray(np.concatenate(qs).astype(np.uint8))
counts = np.zeros(len(qs), np.int64)
total = ctypes.c_int64()
ptr = lib.fsmem_all(
    blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    occ.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    blocks.shape[0],
    cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    n_seqs,
    qbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    len(qs), 0,
    counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    ctypes.byref(total))
lib.frld_free(ctypes.cast(ptr, ctypes.c_void_p))
assert counts.sum() > 0

# threaded EC collect (smem.cpp fec_collect DFS workers)
ccounts = np.zeros(3, np.int64)
ptr = lib.fec_collect(
    blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    occ.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    blocks.shape[0],
    cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    n_seqs, 17, 3, 4,
    ccounts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
lib.frld_free(ctypes.cast(ptr, ctypes.c_void_p))
assert ccounts[0] > 0

print("TSAN driver OK", int(counts.sum()), int(ccounts[0]), file=sys.stderr)
"""


def _libtsan():
    out = subprocess.run(["g++", "-print-file-name=libtsan.so"],
                         capture_output=True, text=True).stdout.strip()
    if out and os.path.isabs(out) and os.path.exists(out):
        return out
    for cand in ("libtsan.so.2", "libtsan.so.0"):
        out = subprocess.run(["g++", f"-print-file-name={cand}"],
                             capture_output=True, text=True).stdout.strip()
        if out and os.path.isabs(out) and os.path.exists(out):
            return out
    return None


@pytest.mark.slow
def test_tsan_threaded_engines():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    lt = _libtsan()
    if lt is None:
        pytest.skip("libtsan not available")
    subprocess.run(["make", "-s", "-C", NATIVE, "tsan"], check=True)
    env = dict(os.environ)
    env["FERMI_TPU_NATIVE_LIB"] = TSAN_LIB
    env["LD_PRELOAD"] = lt
    env["TSAN_OPTIONS"] = "halt_on_error=1 exitcode=66 report_bugs=1"
    env["FERMI_TPU_PLATFORM"] = "cpu"
    env.setdefault("PYTHONPATH", "")
    env["PYTHONPATH"] = f"/root/.axon_site:{REPO}:" + env["PYTHONPATH"]
    r = subprocess.run([sys.executable, "-c", DRIVER], env=env,
                       capture_output=True, text=True, timeout=600)
    sys.stderr.write(r.stderr[-4000:])
    assert r.returncode == 0, f"TSAN reported races (exit {r.returncode})"
