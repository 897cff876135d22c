"""Central JAX configuration: imported by every module that touches jax.

x64 must be on before any tracing — index positions overflow int32 beyond
2^31 symbols (hot arrays still use int32 via FMDIndex.idtype). The persistent
compilation cache amortizes the slow first compile of the big kernels
(remote TPU AOT compiles run minutes)."""

import os

import jax

jax.config.update("jax_enable_x64", True)

# The axon terminal pins jax_platforms at interpreter start, so a plain
# JAX_PLATFORMS env var is ineffective; honor an explicit override here.
_plat = os.environ.get("FERMI_TPU_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)
_cache_dir = os.environ.get("FERMI_TPU_JAX_CACHE", "/tmp/fermi_tpu_jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without these options
    pass
