"""Test configuration: force an 8-device virtual CPU platform.

Multi-device sharding tests run against a virtual CPU mesh via
``--xla_force_host_platform_device_count`` — the standard JAX trick for
exercising pjit/collectives without TPU hardware. Must be set before jax
initializes, hence at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize overrides jax_platforms to
# "axon,cpu" regardless of env vars; force pure-CPU before any backend
# initialization so the virtual 8-device mesh is used.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - backend already initialized
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run the slow tier (compile-heavy integration tests; "
             "equivalently T2P_SLOW_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    """Opt-in slow tier: the ~10 most compile-heavy integration modules
    (DP equivalence, fused epochs, trained pipeline, resume, …) more than
    tripled the default suite's wall time (56 min single-process). They
    are skipped unless ``--slow`` / ``T2P_SLOW_TESTS=1`` — the default
    suite stays the fast correctness gate (≤ ~20 min), the full 200+
    remain one flag away."""
    if config.getoption("--slow") or os.environ.get("T2P_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier: run with --slow or T2P_SLOW_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="module", autouse=True)
def _release_compiled_executables():
    """Drop jit caches between test modules.

    The suite compiles hundreds of distinct XLA:CPU programs in one
    process; late in the run ``backend_compile_and_load`` has been
    observed to segfault inside LLVM (see test_trainers.py::test_steps
    after ~140 green tests — the same test passes in isolation and in
    small groups). Releasing compiled executables between modules keeps
    the CPU client's JIT-code footprint bounded. Costs a few re-compiles
    for helpers shared across modules; worth it for a deterministic
    suite.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def synthetic_data():
    from text2pos_tpu.data.synthetic import make_synthetic_dataset

    return make_synthetic_dataset(seed=0)
