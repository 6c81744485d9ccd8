"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(mesh, halo exchange, PDW merge) are exercised without TPU hardware.

The ambient environment pins ``JAX_PLATFORMS=axon`` (the tunneled TPU, used
by bench.py) and a sitecustomize hook imports jax at interpreter boot — so
env-var edits here are too late for the platform choice; we go through
``jax.config.update`` instead (backends have not initialized yet when
conftest runs).  XLA_FLAGS is still read lazily at backend init, so the
virtual device count can be set via the environment.
"""

import fcntl
import os
import subprocess

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO, "native")


def build_native():
    """Build the native tier exactly once across concurrent test workers.

    ``make -C native`` is not safe to run from several pytest-xdist workers
    at once (two make processes compiling the same object race), so the
    call is serialized through an exclusive file lock.
    """
    lock_path = os.path.join(_NATIVE_DIR, ".build.lock")
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
