"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env before jax is imported anywhere (mirrors how the driver validates
multi-chip sharding without real chips).
"""

import os
import subprocess

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon terminal's sitecustomize registers its TPU plugin at interpreter
# start and force-sets jax_platforms="axon,cpu", so the env var alone is not
# enough — override the config again here (before any computation runs).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_SRC = "/root/reference"
REFERENCE_BIN = "/tmp/ref_build/fermi"


@pytest.fixture(scope="session")
def ref_fermi():
    """Path to the reference fermi binary (built on demand); skips if unavailable."""
    if not os.path.exists(REFERENCE_BIN):
        if not os.path.isdir(REFERENCE_SRC):
            pytest.skip("reference source not available")
        subprocess.run(
            f"cp -r {REFERENCE_SRC} /tmp/ref_build && make -s -C /tmp/ref_build -j8",
            shell=True, check=True, capture_output=True)
    return REFERENCE_BIN


def run_ref(bin_path, *args, stdin=None, binary_out=False):
    res = subprocess.run([bin_path, *map(str, args)], input=stdin,
                         capture_output=True)
    if res.returncode != 0:
        raise RuntimeError(f"reference fermi {args} failed: {res.stderr[-2000:]}")
    return res.stdout if binary_out else res.stdout.decode()
