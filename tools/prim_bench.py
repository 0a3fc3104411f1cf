"""Micro-benchmarks of TPU primitive costs (dev tool)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 22
P = 370 * 1226

key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (N,), 0, P, jnp.int32)
vals = jax.random.uniform(key, (N,), jnp.float32)
ivals = jax.lax.bitcast_convert_type(vals, jnp.int32)
img = jax.random.uniform(key, (P,), jnp.float32)
sorted_idx = jnp.sort(jax.random.randint(key, (N,), 0, N, jnp.int32))
uniq_idx = jnp.arange(N, dtype=jnp.int32)
payload3 = jax.random.uniform(key, (N, 3), jnp.float32)


def t(name, fn, *args, n=3):
    r = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = jax.jit(fn)(*args)
    jax.block_until_ready(r)
    print(f"{name:42s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms")


t("scatter-min 4M->453K", lambda i, v: jnp.full((P,), 2**31 - 1, jnp.int32).at[i].min(v, mode="drop"), idx, ivals)
t("scatter-set 4M->4M (dup ok)", lambda i, v: jnp.zeros((N,), jnp.float32).at[i % N].set(v, mode="drop"), idx, vals)
t("scatter-set 4M->4M unique+sorted flags", lambda i, v: jnp.zeros((N,), jnp.float32).at[i].set(v, mode="drop", unique_indices=True, indices_are_sorted=True), uniq_idx, vals)
t("scatter-set 4M->4M unique+sorted noflags", lambda i, v: jnp.zeros((N,), jnp.float32).at[i].set(v, mode="drop"), uniq_idx, vals)
t("scatter-set [N,3] payload unique+sorted", lambda i, v: jnp.zeros((N, 3), jnp.float32).at[i].set(v, mode="drop", unique_indices=True, indices_are_sorted=True), uniq_idx, payload3)
t("scatter-add 4M->453K", lambda i, v: jnp.zeros((P,), jnp.float32).at[i].add(v, mode="drop"), idx, vals)
t("gather 4M from 453K", lambda i, im: im[jnp.clip(i, 0, P - 1)], idx, img)
t("gather 4M from 4M [N,3]", lambda i, v: v[jnp.clip(i, 0, N - 1)], idx, payload3)
t("sort 4M i32 keys only", lambda v: jnp.sort(v), ivals)
t("sort 4M (key,val) pair", lambda k, v: jax.lax.sort((k, v), num_keys=1), ivals, idx)
t("argsort 4M i32", lambda v: jnp.argsort(v), ivals)
t("cumsum 4M i32", lambda v: jnp.cumsum(v), idx)
t("elementwise 4Mx12 flops", lambda v: (v * 1.0001 + 0.5) * v, payload3)
