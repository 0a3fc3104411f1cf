"""Measure TPU cost: k separate 1-D gathers/scatters vs ONE packed row
gather/scatter — decides whether association/fuse/append should move to a
packed [N, k] attribute table.

Chained via a scalar carry with one float() sync (deferred-backend rules).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, iters=8):
    c = fn(jnp.float32(0), *args)
    _ = float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(iters):
        c = fn(c * 1e-30, *args)
    _ = float(c)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {dt:8.2f} ms")
    return dt


def main():
    A = 1 << 20          # table slots (active-table scale)
    P = 227_000          # pixels (checkerboard of KITTI)
    K = 16
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, A, P).astype(np.int32))
    cols = [jnp.asarray(rng.normal(size=A).astype(np.float32)) for _ in range(K)]
    packed = jnp.stack(cols, axis=1)  # [A, K]
    vals = [jnp.asarray(rng.normal(size=P).astype(np.float32)) for _ in range(K)]
    pvals = jnp.stack(vals, axis=1)   # [P, K]

    @jax.jit
    def g_planar(c, idx, *cols):
        i = (idx + (c * 0).astype(jnp.int32)) % A
        tot = jnp.float32(0)
        for col in cols[:9]:
            tot = tot + jnp.sum(col[i])
        return tot

    @jax.jit
    def g_packed(c, idx, packed):
        i = (idx + (c * 0).astype(jnp.int32)) % A
        return jnp.sum(packed[i])  # [P, K] row gather

    @jax.jit
    def g_packed9(c, idx, packed):
        i = (idx + (c * 0).astype(jnp.int32)) % A
        return jnp.sum(packed[i, :9])

    @jax.jit
    def s_planar(c, idx, *vals):
        i = (idx + (c * 0).astype(jnp.int32)) % A
        tot = jnp.float32(0)
        for v in vals[:10]:
            dst = jnp.zeros((A,), jnp.float32).at[i].set(v)
            tot = tot + dst[0] + dst[-1]
        return tot

    @jax.jit
    def s_packed(c, idx, pvals):
        i = (idx + (c * 0).astype(jnp.int32)) % A
        dst = jnp.zeros((A, K), jnp.float32).at[i].set(pvals)
        return dst[0].sum() + dst[-1].sum()

    @jax.jit
    def smin_1m(c, zk, fp):
        z = zk + (c * 0).astype(jnp.int32)
        buf = jnp.full((453_620,), 2**31 - 1, jnp.int32).at[fp].min(z, mode="drop")
        return (buf[0] + buf[-1]).astype(jnp.float32)

    zk = jnp.asarray(rng.integers(0, 1 << 30, A).astype(np.int32))
    fp = jnp.asarray(rng.integers(0, 453_620, A).astype(np.int32))

    timed("9x 1D gather   [227k from 1M]", g_planar, idx, *cols)
    timed("1x row gather  [227k,16]", g_packed, idx, packed)
    timed("1x row gather  [227k,:9]", g_packed9, idx, packed)
    timed("10x 1D scatter [227k into 1M]", s_planar, idx, *vals)
    timed("1x row scatter [227k,16]", s_packed, idx, pvals)
    timed("scatter-min    [1M into 453k]", smin_1m, zk, fp)


if __name__ == "__main__":
    main()
