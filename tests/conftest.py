"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so that sharding tests
exercise real collectives without TPU hardware, and compiles stay fast.
Must run before the first jax import.
"""

import os
import sys

# NOTE: must OVERRIDE, not setdefault — the dev shell exports
# JAX_PLATFORMS=axon, which would silently put the whole suite on the TPU
# tunnel. The legacy JAX_PLATFORM_NAME is also set: with some plugin
# versions it is the one that actually wins.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The dev container's sitecustomize imports jax at interpreter startup, so
# the env vars above can be too late — jax.config snapshots JAX_PLATFORMS
# at import. config.update works as long as no backend is live yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_platform_name", "cpu")
except Exception:
    pass  # removed in newer jax; jax_platforms alone suffices there
assert jax.default_backend() == "cpu", (
    "test suite must run on the CPU backend, got " + jax.default_backend()
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
TOOLS = os.path.join(REPO_ROOT, "tools")
if TOOLS not in sys.path:
    sys.path.insert(0, TOOLS)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference():
    """The upstream pycvvdp imported as a torch-CPU oracle (skipped when the
    reference checkout is unavailable)."""
    try:
        from refbridge import import_reference

        return import_reference()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference oracle unavailable: {e}")
