"""Perf probes on the real TPU: where does SpMV time go?"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    m = n = 1 << 17  # 131072
    w = 32
    rng = np.random.default_rng(0)
    band = np.clip(np.arange(m)[:, None] + rng.integers(-256, 256, (m, w)), 0, n - 1)
    ind = np.sort(band, 1).astype(np.int32)
    val = rng.standard_normal((m, w)).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    nnz = m * w

    ind_d = jnp.asarray(ind)
    val_d = jnp.asarray(val)
    x_d = jnp.asarray(x)
    indT = jnp.asarray(ind.T.copy())
    valT = jnp.asarray(val.T.copy())

    @jax.jit
    def copy_val(v):
        return v * 2.0

    t = timeit(copy_val, val_d)
    print(f"elementwise (m,w): {nnz*4*2/t/1e9:.0f} GB/s")

    @jax.jit
    def ell_mw(ind, val, x):
        g = jnp.take(x, ind, axis=0)
        return jnp.sum(val * g, axis=1)

    t = timeit(ell_mw, ind_d, val_d, x_d)
    gb = (nnz * 8 + (m + n) * 4) / 1e9
    print(f"ell (m,w) gather+reduce: {t*1e3:.3f} ms, {gb/t:.0f} GB/s, {2*nnz/t/1e9:.1f} GFLOP/s")

    @jax.jit
    def ell_wm(indT, valT, x):
        # (w, m) layout: lanes = rows, accumulate over w
        g = jnp.take(x, indT, axis=0)
        return jnp.sum(valT * g, axis=0)

    t = timeit(ell_wm, indT, valT, x_d)
    print(f"ell (w,m) gather+reduce: {t*1e3:.3f} ms, {gb/t:.0f} GB/s")

    @jax.jit
    def gather_only(ind, x):
        return jnp.take(x, ind, axis=0)

    t = timeit(gather_only, ind_d, x_d)
    print(f"gather (m,w) only: {t*1e3:.3f} ms, {(nnz*8)/t/1e9:.0f} GB/s")

    t = timeit(gather_only, indT, x_d)
    print(f"gather (w,m) only: {t*1e3:.3f} ms, {(nnz*8)/t/1e9:.0f} GB/s")

    # one-hot/take variant: x gathered via dynamic_slice rows? skip
    # segsum path
    rows = np.repeat(np.arange(m, dtype=np.int32), w)
    rows_d = jnp.asarray(rows)
    flat_ind = jnp.asarray(ind.reshape(-1))
    flat_val = jnp.asarray(val.reshape(-1))

    from functools import partial

    @partial(jax.jit, static_argnames=("m",))
    def segsum(ind, val, rows, x, m):
        return jax.ops.segment_sum(val * x[ind], rows, num_segments=m, indices_are_sorted=True)

    t = timeit(segsum, flat_ind, flat_val, rows_d, x_d, m)
    print(f"segsum: {t*1e3:.3f} ms, {gb/t:.0f} GB/s")

    # reshape-as-matmul trick: treat sum over w as dot with ones
    ones = jnp.ones((w,), jnp.float32)

    @jax.jit
    def ell_dot(ind, val, x):
        g = jnp.take(x, ind, axis=0)
        return (val * g) @ ones

    t = timeit(ell_dot, ind_d, val_d, x_d)
    print(f"ell (m,w) dot-ones: {t*1e3:.3f} ms, {gb/t:.0f} GB/s")


if __name__ == "__main__":
    main()
