"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so that sharding tests
exercise real collectives without TPU hardware, and compiles stay fast.
Must run before the first jax import.
"""

import os
import sys

# NOTE: this environment's TPU plugin ignores JAX_PLATFORMS; the legacy
# JAX_PLATFORM_NAME is what actually forces the CPU backend here.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
