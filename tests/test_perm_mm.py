"""MXU one-hot permute engine (kernels/xla/spmv.py perm_rows_mm): the
bit-masked 3-split must make the bf16 matmul permutation EXACT for f32
payloads, and the gen composite must produce identical results with either
permute engine."""

import jax
import jax.numpy as jnp
import numpy as np

from aoclsparse_tpu.kernels.xla.spmv import _split3_exact, perm_rows_mm


def test_split3_reconstructs_exactly(rng):
    x = jnp.asarray(
        np.concatenate(
            [
                rng.standard_normal(1000).astype(np.float32) * 1e6,
                rng.standard_normal(1000).astype(np.float32) * 1e-6,
                np.array([0.0, -0.0, 1.0, -1.0, np.pi], np.float32),
            ]
        ).reshape(-1, 5)
    )
    h1, h2, r2 = _split3_exact(x)
    # pieces are bf16-exact
    for h in (h1, h2):
        assert np.array_equal(
            np.asarray(h), np.asarray(h.astype(jnp.bfloat16).astype(jnp.float32))
        )
    np.testing.assert_array_equal(np.asarray(h1 + h2 + r2), np.asarray(x))


def test_perm_rows_mm_exact(rng):
    nblk, B = 64, 16
    xb = jnp.asarray(rng.standard_normal((nblk, B)).astype(np.float32) * 1e3)
    perm = rng.permutation(nblk)
    P = np.zeros((nblk, nblk), np.float32)
    P[np.arange(nblk), perm] = 1.0
    got = np.asarray(perm_rows_mm(jnp.asarray(P, dtype=jnp.bfloat16), xb))
    want = np.asarray(xb)[perm]
    # exact: each output element is a chain of single 1.0*h products
    np.testing.assert_array_equal(got, want)


def test_gen_bandv_onehot_engine_matches_gather(rng):
    """spmv_gen_bandv with bperm_oh/bout_oh == the row-gather result."""
    from aoclsparse_tpu.kernels.pallas.spmv import band_vert_layout
    from aoclsparse_tpu.kernels.xla.spmv import spmv_gen_bandv

    m_pad, B, W, TM = 512, 32, 8, 64
    nblk = m_pad // B
    vt = rng.standard_normal((W, m_pad)).astype(np.float32)
    vt4 = jnp.asarray(band_vert_layout(vt, TM))
    x = jnp.asarray(rng.standard_normal(m_pad).astype(np.float32))
    bperm = rng.permutation(nblk).astype(np.int32)
    bout = np.empty(nblk, np.int32)
    bout[bperm] = np.arange(nblk)
    Pi = np.zeros((nblk, nblk), np.float32)
    Pi[np.arange(nblk), bperm] = 1.0
    Po = np.zeros((nblk, nblk), np.float32)
    Po[np.arange(nblk), bout] = 1.0
    zi = jnp.zeros((1,), jnp.int32)
    zv = jnp.zeros((1,), jnp.float32)
    zm = jnp.zeros((1, 1), jnp.float32)
    common = dict(
        B=B, W=W, padL=0, start=0, TM=TM, m=m_pad, m_pad=m_pad, interpret=True
    )
    y_g = spmv_gen_bandv(
        vt4, x, jnp.asarray(bperm), jnp.asarray(bout), zv, zm, zi, zm, zi,
        zv, zi, zi, **common
    )
    y_m = spmv_gen_bandv(
        vt4, x, jnp.asarray(bperm), jnp.asarray(bout), zv, zm, zi, zm, zi,
        zv, zi, zi,
        bperm_oh=jnp.asarray(Pi, dtype=jnp.bfloat16),
        bout_oh=jnp.asarray(Po, dtype=jnp.bfloat16),
        **common
    )
    np.testing.assert_array_equal(np.asarray(y_g), np.asarray(y_m))
