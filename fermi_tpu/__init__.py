"""fermi-tpu: TPU-native FMD-index genome assembly framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of lh3/fermi
(reference analysis in SURVEY.md). Compute runs as batched kernels over a
device-resident blocked-occ FM-index; on-disk artifacts (.fmd, ec.fq, MAG)
match the reference byte-for-byte.
"""

__version__ = "0.1.0"

import os as _os


def _enable_jax_compile_cache():
    """Persistent XLA compilation cache: pipeline stages run in fresh
    processes, and the big while-loop kernels cost 20-40 s to compile on
    the TPU; the disk cache turns every later process's compile into a
    sub-second load (measured 1.8 s -> 0.3 s even for a small loop)."""
    if _os.environ.get("FERMI_TPU_NO_COMPILE_CACHE"):
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # caller already configured it
    try:
        path = _os.path.join(
            _os.path.expanduser("~"), ".cache", "fermi_tpu", "jax")
        _os.makedirs(path, exist_ok=True)
        import sys as _sys
        if "jax" in _sys.modules:
            # jax may be pre-imported at interpreter start (the axon
            # sitecustomize does), in which case its config already read
            # the env — set it through the config API
            import jax
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
        else:
            # env route keeps jax-free CLI paths jax-free
            _os.environ["JAX_COMPILATION_CACHE_DIR"] = path
            _os.environ.setdefault(
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    except Exception:
        pass


def _tune_malloc():
    """Keep big freed buffers on the heap instead of returning them to the
    kernel.  glibc munmaps every freed allocation above 128 KB, so each
    numpy/C++ temporary re-faults its pages — and fresh-page faults on this
    class of VM host run at 0.1-1 GB/s (measured: an 800 MB cumsum costs
    6.5 s cold vs 0.6 s on reused pages).  Raising M_MMAP_THRESHOLD and
    M_TRIM_THRESHOLD makes the second and later temporaries of a pipeline
    stage ~10x faster.  Process-global: covers numpy and the native
    engines' std::vector/malloc alike."""
    if _os.environ.get("FERMI_TPU_NO_MALLOC_TUNE"):
        return
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)   # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)   # M_TRIM_THRESHOLD
    except Exception:
        pass


_enable_jax_compile_cache()
_tune_malloc()
