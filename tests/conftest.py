"""Test configuration: run on CPU with 8 fake devices and 64-bit floats.

Golden-value parity tests (vs Pinocchio-derived fixtures) require f64; the
fake-device mesh lets multi-chip sharding be exercised without TPU hardware.

Note: this environment may pre-import jax and register a TPU platform plugin
via sitecustomize before conftest runs, so plain env vars are not enough —
``jax.config.update("jax_platforms", "cpu")`` overrides the default backend
even after import (the backend client itself is created lazily, so the
XLA_FLAGS fake-device count still takes effect).
"""

import os

# OPTIK_TPU_TESTS=1 keeps the real TPU backend so tests/test_tpu.py can run
# the compiled Mosaic kernel on hardware (everything else auto-skips there);
# the default is the fake-device CPU configuration below.
_ON_DEVICE = os.environ.get("OPTIK_TPU_TESTS") == "1"

if not _ON_DEVICE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_DEVICE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# The unrolled SoA solver bodies take O(30 s) to compile; cache compiled
# executables on disk so repeat test runs don't pay it again.
import pathlib  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache")
    if _ON_DEVICE else "/tmp/optik_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs the compiled Mosaic kernel on real TPU "
        "hardware (needs OPTIK_TPU_TESTS=1)")
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running tests")


def pytest_collection_modifyitems(config, items):
    import pytest

    if _ON_DEVICE:
        skip = pytest.mark.skip(
            reason="OPTIK_TPU_TESTS=1 runs only @pytest.mark.tpu tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="on-device test: run OPTIK_TPU_TESTS=1 pytest "
            "tests/test_tpu.py on a TPU host")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
