"""Test configuration: run on CPU with 8 virtual devices and x64 enabled.

Mirrors SURVEY.md §4's plan: reference-parity tests need f64/complex128
(CPU), and the multi-chip sharding tests need an 8-device virtual mesh
(XLA_FLAGS --xla_force_host_platform_device_count).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides jax_platforms programmatically,
# so the env var alone is not enough — force CPU before any backend init to
# keep tests off the (single, lock-contended) TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def random_csr(rng, m, n, density=0.3, dtype=np.float64, ensure_diag=False, sorted_ind=True):
    """Deterministic random CSR in raw numpy arrays (analog of
    tests/include/aoclsparse_init.hpp:50-320)."""
    mask = rng.random((m, n)) < density
    if ensure_diag:
        for i in range(min(m, n)):
            mask[i, i] = True
    dense = np.zeros((m, n), dtype=dtype)
    vals = rng.standard_normal(mask.sum())
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        vals = vals + 1j * rng.standard_normal(mask.sum())
    dense[mask] = vals.astype(dtype)
    if ensure_diag:
        for i in range(min(m, n)):
            dense[i, i] += m  # diagonally dominant enough for solves
    ptr = np.zeros(m + 1, dtype=np.int32)
    ind = []
    val = []
    for i in range(m):
        cols = np.nonzero(mask[i])[0]
        if not sorted_ind and cols.size > 1:
            cols = cols[rng.permutation(cols.size)]
        ind.extend(cols.tolist())
        val.extend(dense[i, cols].tolist())
        ptr[i + 1] = len(ind)
    return ptr, np.asarray(ind, np.int32), np.asarray(val, dtype), dense


@pytest.fixture
def make_csr(rng):
    def f(m, n, **kw):
        return random_csr(rng, m, n, **kw)

    return f
