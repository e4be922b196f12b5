"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy of simulating multi-node runs with
oversubscribed local MPI ranks (reference: tests/CMakeLists.txt:1-3,
``MPI_RANKS 1 4 16 32 --oversubscribe``): distributed logic is exercised on
``xla_force_host_platform_device_count=8`` CPU devices so no TPU hardware is
needed (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin (sitecustomize) force-sets jax_platforms at interpreter
# start; override it after import so tests always run on the CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def reference_mesh(name: str) -> str:
    """Path of a shipped reference mesh; skip the calling test when the
    read-only reference checkout is not present on this machine."""
    import pytest

    path = f"/root/reference/data/{name}"
    if not os.path.exists(path):
        pytest.skip(f"reference mesh {name} not available")
    return path
