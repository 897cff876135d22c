"""End-to-end assembly pipeline (replaces run-fermi.pl + its Makefile).

Same artifact DAG and stage semantics as the reference pipeline
(run-fermi.pl:53-104), with two deliberate changes: stages run in-process
against the framework's own components, and inter-stage metadata (insert-size
avg/std/cap) flows through a JSON sidecar instead of being grepped out of
stderr logs (reference smem.c:387 / run-fermi.pl:101-103).

Every stage writes a durable artifact and is skipped when the artifact
already exists, so interrupted runs resume for free (the reference gets this
from make).
"""

import gzip
import io
import json
import os
import sys
import time

import numpy as np


def log(stage, msg):
    sys.stderr.write(f"[pipeline::{stage}] {msg}\n")
    sys.stderr.flush()


class _GzPipeWriter:
    """Text sink compressing through an external `gzip -1` process, so the
    deflate runs on its own core alongside the producing stage — the same
    overlap the reference chain gets from `fermi clean ... | gzip -1` in
    run-fermi.pl's Makefile.  Context-managed; raises if gzip fails."""

    def __init__(self, path):
        import subprocess
        self._f = open(path, "wb")
        self._proc = subprocess.Popen(
            ["gzip", "-1", "-c"], stdin=subprocess.PIPE, stdout=self._f,
            bufsize=1 << 20)
        self._w = io.TextIOWrapper(self._proc.stdin, write_through=False)

    def write(self, s):
        self._w.write(s)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self._w.close()
        else:
            # the stage is already unwinding; a dead gzip (disk full,
            # killed) would raise BrokenPipeError here and mask the
            # original exception
            try:
                self._w.close()
            except (BrokenPipeError, ValueError, OSError):
                pass
        rc = self._proc.wait()
        self._f.close()
        if exc_type is None and rc != 0:
            raise OSError(f"gzip exited with {rc}")
        return False


def _gz_text_writer(path):
    """`gzip -1` subprocess writer when the binary exists, else in-process."""
    import shutil

    if shutil.which("gzip"):
        return _GzPipeWriter(path)
    return io.TextIOWrapper(gzip.open(path, "wb", 1))


class Pipeline:
    def __init__(self, prefix, n_threads=8, unitig_k=50, paired=False,
                 trim_l=0, skip_ec=False, unitig_threads=None):
        self.prefix = prefix
        self.t = n_threads
        self.k = unitig_k
        self.paired = paired
        self.trim_l = trim_l
        self.skip_ec = skip_ec
        # unitig threads default to n_threads like run-fermi.pl's
        # `unitig -t $t`; pass 1 for byte-reproducible output (the
        # reference's threaded unitig is timing-dependent too —
        # unitig.c:336-339 raced bitmaps)
        self.unitig_threads = (n_threads if unitig_threads is None
                               else unitig_threads)
        self.min_clean_o = int(unitig_k * 1.2 + 0.499)
        self._cache = {}  # in-process index reuse across stages

    def _p(self, suffix):
        return f"{self.prefix}.{suffix}"

    def _runs(self, path):
        key = ("runs", path)
        if key not in self._cache:
            from fermi_tpu import rld
            self._cache[key] = rld.read_fmd(path)
        return self._cache[key]

    def _fmd(self, path):
        key = ("fmd", path)
        if key not in self._cache:
            from fermi_tpu.index.fmd import FMDIndex
            self._cache[key] = FMDIndex.from_runs(self._runs(path))
        return self._cache[key]

    def _host(self, path):
        key = ("host", path)
        if key not in self._cache:
            from fermi_tpu.algos.hostindex import HostIndex
            self._cache[key] = HostIndex.from_runs(self._runs(path))
        return self._cache[key]

    def _done(self, suffix):
        return os.path.exists(self._p(suffix))

    @staticmethod
    def _prewarm_sa(n_symbols):
        """Fault in the native SA scratch arenas on a background thread
        while the host assembles the text (ctypes drops the GIL)."""
        try:
            from fermi_tpu import native
            lib = native.get_lib()
        except Exception:
            return None
        import threading
        th = threading.Thread(
            target=lambda: lib.fsa_prewarm(int(n_symbols), 4), daemon=True)
        th.start()
        return th

    def _build_bwt(self, text):
        """BWT builder dispatch: the blocked device path (wsort blocks +
        gap-bit merge, construct/blocked.py) when a TPU-class backend is
        present; on the host, column-wise BCR for large short-read texts
        (native/bcr.cpp — its work scales with read length, while the SA
        engine's bucket sorts degrade superlinearly past ~100 Msym) and the
        threaded SA engine otherwise.  FERMI_TPU_DEVICE_BUILD=1/0 forces
        device/host."""
        from fermi_tpu.construct import suffix

        engine = self._plan_builder(int(text.size))
        if engine == "device":
            from fermi_tpu.construct import blocked
            return blocked.device_build_text(
                text, progress=lambda m: log("build", m))
        if engine == "bcr" and self._short_read_text(text):
            from fermi_tpu.construct.bcr import bcr_bwt_native
            return bcr_bwt_native(text, n_threads=self.t)
        return suffix.multistring_bwt(text)

    @staticmethod
    def _short_read_text(text):
        sent = np.flatnonzero(text[: 1 << 20] == 0)
        return len(sent) and (1 << 20) / len(sent) < 1024

    def _build_runs(self, text):
        """BWT as RLE runs, engine-dispatched; the BCR engine emits runs
        directly (its class streams already ARE the RLE), others go through
        the dense BWT."""
        from fermi_tpu import rld

        if (self._plan_builder(int(text.size)) == "bcr"
                and self._short_read_text(text)):
            from fermi_tpu.construct.bcr import bcr_runs_native
            return bcr_runs_native(text, n_threads=self.t)
        return rld.Runs.from_bwt(self._build_bwt(text))

    @staticmethod
    def _plan_builder(n_symbols):
        """'device' | 'bcr' | 'sa' — decided WITHOUT initializing a JAX
        backend (the tunneled axon backend costs 0-35 s just to handshake,
        absurd on a path that then stays on the host)."""
        mode = os.environ.get("FERMI_TPU_DEVICE_BUILD", "auto")
        use_dev = mode == "1"
        if mode == "auto":
            # device build wins whenever host<->device bandwidth is sane
            # (PCIe ~16 GB/s); over a remote-tunneled chip (axon, ~10 MB/s
            # measured) round-tripping text+BWT always loses to the host
            plat = os.environ.get("JAX_PLATFORMS", "").lower()
            if "axon" in plat or plat == "cpu":
                use_dev = False
            elif "tpu" in plat:
                use_dev = True
            else:
                try:
                    import jax
                    use_dev = (jax.default_backend() not in ("cpu",)
                               and "axon" not in jax._src.xla_bridge.backends())
                except Exception:
                    use_dev = False
        if use_dev:
            return "device"
        return "bcr" if n_symbols > (64 << 20) else "sa"

    # -- stages ------------------------------------------------------------

    @staticmethod
    def _frags_from_fastq(paths):
        """(F, offsets) forward-only nt6 fragments straight from plain
        4-line FASTQ bytes (native fencode_frags: table encode + maximal
        ACGT-run split in one threaded C pass); None when a file isn't
        that shape."""
        import gzip as _gz

        from fermi_tpu.core import fastx
        Fs, offs_list = [], []
        for path in paths:
            if not str(path).endswith(".gz"):
                fo = Pipeline._frags_from_plain_fastq(path)
                if fo is not None:
                    Fs.append(fo[0])
                    offs_list.append(fo[1])
                    continue
            opener = _gz.open if str(path).endswith(".gz") else open
            with opener(path, "rb") as f:
                data = f.read()
            sp = fastx.fastq_seq_spans(data)
            if sp is None:
                return None
            fo = Pipeline._encode_spans(*sp)
            if fo is None:
                return None
            F, offs = fo
            Fs.append(F)
            offs_list.append(offs)
        if len(Fs) == 1:
            return Fs[0], offs_list[0]
        base = 0
        adj = []
        for F, offs in zip(Fs, offs_list):
            adj.append(offs[:-1] + base if adj else offs[:-1])
            base += len(F)
        adj.append(np.array([base], np.int64))
        return np.concatenate(Fs), np.concatenate(adj)

    @staticmethod
    def _frags_from_plain_fastq(path):
        """(F, offsets) straight from a plain 4-line FASTQ file in one
        native pass (ffastq_frags: mmap + threaded newline scan + encode +
        ACGT-run split, zero-copy adoption of the result buffers); None on
        any shape/IO problem so callers can fall back."""
        import ctypes

        try:
            from fermi_tpu import native
            lib = native.get_lib()
        except Exception:
            return None
        pF = ctypes.POINTER(ctypes.c_uint8)()
        pO = ctypes.POINTER(ctypes.c_int64)()
        nfrag = ctypes.c_int64()
        n = lib.ffastq_frags(str(path).encode(),
                             min(os.cpu_count() or 1, 8),
                             ctypes.byref(pF), ctypes.byref(pO),
                             ctypes.byref(nfrag))
        if n < 0:
            return None
        F = native.adopt_array(pF, int(n), np.uint8)
        offs = native.adopt_array(pO, int(nfrag.value) + 1, np.int64)
        return F, offs

    @staticmethod
    def _encode_spans(arr, starts, lens):
        """(F, offsets) forward nt6 fragments from seq spans over a raw
        byte buffer (native fencode_frags: table encode + maximal ACGT-run
        split in one threaded C pass); None without the lib."""
        import ctypes

        try:
            from fermi_tpu import native
            lib = native.get_lib()
        except Exception:
            return None
        starts = np.ascontiguousarray(starts, np.int64)
        lens = np.ascontiguousarray(lens, np.int64)
        pF = ctypes.POINTER(ctypes.c_uint8)()
        pO = ctypes.POINTER(ctypes.c_int64)()
        nfrag = lib.fencode_frags(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(starts), 4, ctypes.byref(pF), ctypes.byref(pO))
        try:
            offs = np.ctypeslib.as_array(pO, shape=(nfrag + 1,)).copy()
            F = np.ctypeslib.as_array(pF, shape=(int(offs[-1]),)).copy()
        finally:
            lib.frld_free(ctypes.cast(pF, ctypes.c_void_p))
            lib.frld_free(ctypes.cast(pO, ctypes.c_void_p))
        return F, offs

    def _build_from_frags(self, F, offs, out_fmd, t0):
        """BWT + .fmd dump from forward-only nt6 fragments (the shared
        tail of every index build)."""
        from fermi_tpu.construct import suffix
        from fermi_tpu import rld

        nfrag = len(offs) - 1
        n_est = 2 * len(F) + 2 * nfrag
        mean_l = len(F) / max(nfrag, 1)
        t_text = time.time()
        log("build", f"{nfrag} fragments, {n_est / 1e6:.1f}M "
            "symbols (native frags)")
        if (self._plan_builder(n_est) == "bcr" and mean_l < 1024):
            # fragments-direct BCR: rc strands synthesized in the
            # builder, the doubled text never materializes
            from fermi_tpu.construct.bcr import bcr_runs_from_frags
            runs = bcr_runs_from_frags(F, offs, n_threads=self.t)
        else:
            text = suffix.build_text_packed(F, offs)
            runs = self._build_runs(text)
        t_bwt = time.time()
        rld.write_fmd(runs, out_fmd)
        self._cache[("runs", out_fmd)] = runs
        log("build", f"wrote {out_fmd} in {time.time() - t0:.1f}s "
            f"(frags {t_text - t0:.1f}, bwt {t_bwt - t_text:.1f}, "
            f"rle+dump {time.time() - t_bwt:.1f})")

    def build_index(self, reads_iter, out_fmd, cut_n=True, paths=None):
        """raw/ec FMD-index (the reference's ropebwt -a bcr stage)."""
        from fermi_tpu.core import dna
        from fermi_tpu.construct import suffix
        from fermi_tpu import rld

        t0 = time.time()
        if paths is not None:
            fo = self._frags_from_fastq(paths)
            if fo is not None:
                self._build_from_frags(*fo, out_fmd, t0)
                return
        # join reads with N: encode maps it to 5, and fragments are maximal
        # runs of non-5 symbols, so one vectorized pass covers cut_n too
        blob = "N".join(reads_iter)
        t_read = time.time()
        # SA scratch prewarm only pays on the SA path; on the BCR path it
        # prefaults ~13 B/sym of unused arenas and steals the text-assembly
        # cores (measured: text step 7 s -> 16 s)
        n_est = 2 * len(blob) + 2_000_000
        warm = (self._prewarm_sa(n_est)
                if self._plan_builder(n_est) == "sa" else None)
        enc = dna.encode(blob)
        del blob
        ok = enc != 5
        edge = np.diff(ok.view(np.int8), prepend=np.int8(0),
                       append=np.int8(0))
        starts = np.flatnonzero(edge == 1)
        ends = np.flatnonzero(edge == -1)
        F = enc[ok]
        lens = ends - starts
        offsets = np.concatenate([[0], np.cumsum(lens)])
        n_frags = len(lens)
        text = suffix.build_text_packed(F, offsets)
        log("build",
            f"{n_frags} fragments, {text.size / 1e6:.1f}M symbols")
        if warm is not None:
            warm.join()
        t_text = time.time()
        runs = self._build_runs(text)
        t_bwt = time.time()
        rld.write_fmd(runs, out_fmd)
        self._cache[("runs", out_fmd)] = runs
        log("build", f"wrote {out_fmd} in {time.time() - t0:.1f}s "
            f"(read {t_read - t0:.1f}, text {t_text - t_read:.1f}, "
            f"bwt {t_bwt - t_text:.1f}, rle+dump {time.time() - t_bwt:.1f})")

    def stage_raw_fmd(self, fastx_paths):
        if self.skip_ec:
            out = self._p("ec.fmd")
        else:
            out = self._p("raw.fmd")
        if os.path.exists(out):
            return
        from fermi_tpu.core import fastx

        def reads():
            for path in fastx_paths:
                for rec in fastx.read_fastx(path):
                    yield rec.seq

        self.build_index(reads(), out, cut_n=True, paths=list(fastx_paths))

    def stage_correct(self, fastx_paths):
        out = self._p("ec.fq.gz")
        if self.skip_ec or os.path.exists(out):
            return
        from fermi_tpu.algos import correct as ec

        # index form follows the collect dispatch: the device BFS needs
        # the device-resident FMDIndex; the native DFS gets the host
        # mirror (same blocked layout, no device round-trip)
        if ec.wants_device_collect():
            idx = self._fmd(self._p("raw.fmd"))
        else:
            idx = self._host(self._p("raw.fmd"))
        with _gz_text_writer(out + ".tmp") as fp:
            # the reference corrects the concatenated input stream
            ec.ec_correct(idx, list(fastx_paths), fp, n_threads=self.t,
                          is_paired=self.paired, trim_l=self.trim_l)
        os.rename(out + ".tmp", out)

    def stage_ec_fmd(self):
        out = self._p("ec.fmd")
        if os.path.exists(out):
            return
        from fermi_tpu.cli import sequtils as su
        from fermi_tpu.core import fastx

        src = self._p("ec.fq.gz")
        t0 = time.time()
        # fused path: fltuniq keep flags -> kept seq spans -> fragments ->
        # BCR, never materializing the filtered FASTQ (identical frags to
        # the flt.fq round-trip by construction: same spans, same encoder)
        spans = su.fltuniq_kept_seq_spans(src)
        if spans is not None:
            fo = self._encode_spans(*spans)
            if fo is not None:
                log("ec_fmd", f"fltuniq fused: kept {len(spans[1])} reads "
                    f"in {time.time() - t0:.1f}s")
                self._build_from_frags(*fo, out, t0)
                return
        flt = self._p("flt.fq")
        with open(flt, "w") as fp:
            su.fltuniq(src, fp)

        def reads():
            for rec in fastx.read_fastx(flt):
                yield rec.seq

        self.build_index(reads(), out, cut_n=False, paths=[flt])
        os.remove(flt)

    def stage_rank(self):
        out = self._p("ec.rank")
        if not self.paired or os.path.exists(out):
            return
        # same platform dispatch as the builder: on a directly-attached TPU
        # the batched device walk wins; over the tunneled dev chip (or on
        # cpu) the threaded host engine does (the tunnel's remote compile
        # latency is also unbounded — measured 15 s..479 s for this stage)
        if self._plan_builder(1 << 30) == "device":
            from fermi_tpu.algos.seqsort import seqsort
            arr = seqsort(self._fmd(self._p("ec.fmd")))
        else:
            from fermi_tpu.algos.seqsort import seqsort_native
            t0 = time.time()
            h = self._host(self._p("ec.fmd"))
            t1 = time.time()
            arr = seqsort_native(h, n_threads=self.t)
            log("rank", f"host-index {t1 - t0:.1f}s, walk "
                f"{time.time() - t1:.1f}s")
        arr.tofile(out)

    def stage_unitig(self):
        out = self._p("p0.mag.gz")
        if os.path.exists(out):
            return
        from fermi_tpu.algos.unitig import fm6_unitig

        e = self._host(self._p("ec.fmd"))
        sorted_arr = None
        if self.paired:
            sorted_arr = np.fromfile(self._p("ec.rank"), np.uint64)
        # FERMI_UNITIG_THREADS overrides the constructor's choice
        ut = int(os.environ.get("FERMI_UNITIG_THREADS",
                                str(self.unitig_threads)))
        with _gz_text_writer(out + ".tmp") as fp:
            if os.environ.get("FERMI_TPU_DEVICE_UNITIG", "0") == "1":
                from fermi_tpu.algos.unitig_bulk import fm6_unitig_device

                fm6_unitig_device(e, self._p("ec.fmd"), self.k, fp,
                                  sorted_arr=sorted_arr)
            else:
                fm6_unitig(e, self.k, fp, sorted_arr, n_threads=ut)
        os.rename(out + ".tmp", out)

    def _clean(self, src, dst, **over):
        if os.path.exists(self._p(dst)):
            return
        from fermi_tpu.algos import mag as M

        opt = dict(M.DEFAULT_OPT)
        opt.update(over)
        g = M.mag_read(self._p(src), opt)
        M.g_clean(g, opt)
        with _gz_text_writer(self._p(dst) + ".tmp") as fp:
            M.mag_print(g, fp)
        os.rename(self._p(dst) + ".tmp", self._p(dst))

    def stage_clean(self):
        self._clean("p0.mag.gz", "p1.mag.gz")
        self._clean("p1.mag.gz", "p2.mag.gz", flag_clean=True,
                    flag_aggressive=True, flag_read_ori=True,
                    flag_no_amend=True, min_ovlp=self.min_clean_o)

    def stage_remap(self):
        out = self._p("p3.mag.gz")
        if not self.paired or os.path.exists(out):
            return
        from fermi_tpu.algos.remap import remap

        # host mirror: remap's contig queries run in the native SMEM engine,
        # so a device-resident index would only add full-BWT d2h transfers
        idx = self._host(self._p("ec.fmd"))
        sorted_arr = np.fromfile(self._p("ec.rank"), np.uint64)
        with _gz_text_writer(out + ".tmp") as fp:
            avg, std, cap = remap(idx, self._p("p2.mag.gz"), fp, sorted_arr)
        os.rename(out + ".tmp", out)
        with open(self._p("insert.json"), "w") as fp:
            json.dump({"avg": avg, "std": std, "cap": cap}, fp)

    def stage_scaf(self):
        out = self._p("p4.fa.gz")
        if not self.paired or os.path.exists(out):
            return
        from fermi_tpu.algos.scaf import scaf_core

        stats = json.load(open(self._p("insert.json")))
        e = self._host(self._p("ec.fmd"))
        with _gz_text_writer(out + ".tmp") as fp:
            scaf_core(e, self._p("p3.mag.gz"), stats["avg"], stats["std"],
                      pr_links=True, out_fp=fp)
        os.rename(out + ".tmp", out)

    def stage_final_remap(self):
        out = self._p("p5.fq.gz")
        if not self.paired or os.path.exists(out):
            return
        from fermi_tpu.algos.remap import remap

        stats = json.load(open(self._p("insert.json")))
        idx = self._host(self._p("ec.fmd"))
        sorted_arr = np.fromfile(self._p("ec.rank"), np.uint64)
        with _gz_text_writer(out + ".tmp") as fp:
            remap(idx, self._p("p4.fa.gz"), fp, sorted_arr, min_pcv=2,
                  max_dist=stats["cap"])
        os.rename(out + ".tmp", out)

    def run(self, fastx_paths):
        t0 = time.time()
        stages = [("raw_fmd", lambda: self.stage_raw_fmd(fastx_paths)),
                  ("correct", lambda: self.stage_correct(fastx_paths))]
        if not self.skip_ec:
            stages.append(("ec_fmd", self.stage_ec_fmd))
        stages += [("rank", self.stage_rank),
                   ("unitig", self.stage_unitig),
                   ("clean", self.stage_clean),
                   ("remap", self.stage_remap),
                   ("scaf", self.stage_scaf),
                   ("final_remap", self.stage_final_remap)]
        for name, fn in stages:
            ts = time.time()
            fn()
            log("run", f"stage {name}: {time.time() - ts:.1f}s")
        final = "p5.fq.gz" if self.paired else "p2.mag.gz"
        log("run", f"done -> {self._p(final)} in {time.time() - t0:.1f}s")
        return self._p(final)
