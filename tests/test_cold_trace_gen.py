"""Cold-trace regression for the gen composite's lazy caches: every lazy
device artifact built on first use (zero placeholders, bf16 band, permute
maps/one-hots) must be CONCRETE even when that first use happens inside a
user jit trace — a cached tracer poisons every later trace
(UnexpectedTracerError; hit in the r4 gen probe when the bf16 variant
retraced after the f32 loop had populated the caches)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aoclsparse_tpu as ast
from aoclsparse_tpu import MatrixDescriptor, Operation
from aoclsparse_tpu.ops.level2.mv import _run_exec_form
from aoclsparse_tpu.planner.plan import get_plan


def _gen_matrix(rng, m=4096):
    # local band + hubs + scatter: forces hub/spill branches of the gen form
    rows = np.repeat(np.arange(m, dtype=np.int64), 4)
    cols = np.clip(rows + rng.integers(-8, 9, rows.size), 0, m - 1)
    hubs = rng.choice(m, 8, replace=False)
    hr = rng.integers(0, m, m // 8)
    sr = rng.integers(0, m, m // 16)
    r = np.concatenate([rows, hr, sr])
    c = np.concatenate([cols, hubs[rng.integers(0, 8, hr.size)], rng.integers(0, m, sr.size)])
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    keep = np.concatenate([[True], (r[1:] != r[:-1]) | (c[1:] != c[:-1])])
    r, c = r[keep], c[keep]
    dr = np.setdiff1d(np.arange(m), r[c == r])
    r = np.concatenate([r, dr])
    c = np.concatenate([c, dr])
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    ptr = np.zeros(m + 1, np.int64)
    np.add.at(ptr, r + 1, 1)
    return ast.create_csr(
        m, m, np.cumsum(ptr), c.astype(np.int32),
        rng.standard_normal(r.size).astype(np.float32),
    )


def test_gen_cold_trace_then_retrace(rng):
    A = _gen_matrix(rng)
    plan = get_plan(A)
    try:
        form = plan.exec_form_for(MatrixDescriptor(), Operation.none, kind="gen",
                                  dtype=A.dtype)
    except Exception:
        pytest.skip("gen form not buildable for this operand on this backend")
    x = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    ref = None
    for env in ("0", "1", "0"):  # f32 trace -> bf16 retrace -> f32 retrace
        os.environ["AOCLSPARSE_TPU_MIXED_PRECISION"] = env
        try:

            @jax.jit
            def loop(eps, x0):
                def body(i, carry):
                    xc, acc = carry
                    y = _run_exec_form(form, xc, None)
                    return (xc.at[:128].add(eps * y[:128]), acc + y[0])

                _, acc = jax.lax.fori_loop(0, 3, body, (x0, jnp.float32(0.0)))
                return acc

            a = float(loop(jnp.float32(1e-7), x))
            a2 = float(loop(jnp.float32(1e-7), x))
            assert np.isfinite(a) and np.isfinite(a2)
            if env == "0":
                if ref is None:
                    ref = a
                else:
                    assert a == ref  # caches must not corrupt values either
        finally:
            os.environ["AOCLSPARSE_TPU_MIXED_PRECISION"] = "0"
