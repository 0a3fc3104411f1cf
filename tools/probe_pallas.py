"""Microbenchmarks for the TPU kernel design decisions (round 2).

Measures, on the real chip:
  1. max usable VMEM for a pallas kernel (v5e should allow ~100+ MB);
  2. serial-loop indirection cost in pallas:
     a. dynamic-major row load + one-hot lane extract (random gather),
     b. dynamic-major row RMW blend (random scatter),
     c. dynamic sublane-indexed row load/store on a (N, 128) ref;
  3. XLA baselines at active-table size: gather rows, scatter rows,
     full-array scatter-min (z-buffer), cumsum-compact, sort.

Run: python tools/probe_pallas.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


# ---------------------------------------------------------------------------
# 1. VMEM ceiling
# ---------------------------------------------------------------------------
def probe_vmem():
    print("== VMEM ceiling ==")
    for mb in (16, 32, 64, 96, 110, 120):
        n = mb * 1024 * 1024 // 4 // 128

        def kern(x_ref, o_ref, scratch):
            scratch[0, :] = x_ref[0, :]
            o_ref[:] = x_ref[:]

        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
            )
            x = jnp.ones((8, 128), jnp.float32)
            jax.block_until_ready(jax.jit(f)(x))
            print(f"  {mb} MB scratch: OK")
        except Exception as e:
            print(f"  {mb} MB scratch: FAIL ({str(e)[:120]})")
            break


# ---------------------------------------------------------------------------
# 2a. serial gather: out[i] = table[idx[i] // 128, idx[i] % 128]
#     table (T//128, 128) f32; one-hot lane extract
# ---------------------------------------------------------------------------
def probe_serial_gather(N=262144, T=524288):
    print(f"== pallas serial gather (one-hot lane extract), N={N}, T={T} ==")

    def kern(idx_ref, table_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, _):
            ix = idx_ref[i, 0]
            r = ix // 128
            l = ix % 128
            row = table_ref[r, :].reshape(1, 128)
            v = jnp.sum(jnp.where(lanes == l, row, 0.0))
            out_ref[i, 0] = v
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N, 1), 0, T, jnp.int32)
    table = jax.random.normal(key, (T // 128, 128), jnp.float32)
    try:
        ms = timeit(jax.jit(f), idx, table, n=10)
        print(f"  {ms:.2f} ms  ({ms*1e6/N:.1f} ns/elem, {ms*1e6/N*0.94:.1f} cyc@940MHz)")
    except Exception as e:
        print(f"  FAIL: {str(e)[:300]}")


# 2b. serial row gather: out[i, :] = table[idx[i], :]  (rows of 128)
def probe_serial_rowgather(N=262144, T=524288 // 128):
    print(f"== pallas serial ROW gather (dyn sublane), N={N}, Trows={T} ==")

    def kern(idx_ref, table_ref, out_ref):
        def body(i, _):
            ix = idx_ref[i, 0]
            out_ref[i, :] = table_ref[ix, :]
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N, 1), 0, T, jnp.int32)
    table = jax.random.normal(key, (T, 128), jnp.float32)
    try:
        ms = timeit(jax.jit(f), idx, table, n=10)
        print(f"  {ms:.2f} ms  ({ms*1e6/N:.1f} ns/elem)")
    except Exception as e:
        print(f"  FAIL: {str(e)[:300]}")


# 2c. serial row scatter RMW: buf[idx[i]] min= key[i]   (z-buffer core)
def probe_serial_zbuf(N=262144, P=453120):
    print(f"== pallas serial z-buffer scatter-min, N={N}, P={P} ==")
    Prows = (P + 127) // 128

    def kern(idx_ref, key_ref, out_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, _):
            ix = idx_ref[i, 0]
            k = key_ref[i, 0]
            r = ix // 128
            l = ix % 128
            row = out_ref[r, :].reshape(1, 128)
            upd = jnp.where((lanes == l) & (k < row), k, row)
            out_ref[r, :] = upd.reshape(128)
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Prows, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N, 1), 0, P, jnp.int32)
    keys = jax.random.normal(key, (N, 1), jnp.float32)
    try:
        ms = timeit(jax.jit(f), idx, keys, n=10)
        print(f"  {ms:.2f} ms  ({ms*1e6/N:.1f} ns/elem)")
    except Exception as e:
        print(f"  FAIL: {str(e)[:300]}")


# ---------------------------------------------------------------------------
# 3. XLA baselines at active-table scale
# ---------------------------------------------------------------------------
def probe_xla(N=453120, T=524288):
    print(f"== XLA baselines, N={N}, T={T} ==")
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jax.random.randint(k1, (N,), 0, T, jnp.int32)
    table16 = jax.random.normal(k2, (T, 16), jnp.float32)
    table1 = jax.random.normal(k2, (T,), jnp.float32)
    vals16 = jax.random.normal(k3, (N, 16), jnp.float32)
    vals1 = jax.random.normal(k3, (N,), jnp.float32)

    ms = timeit(jax.jit(lambda t, i: t[i]), table16, idx)
    print(f"  gather rows (N,16): {ms:.2f} ms ({ms*1e6/N:.1f} ns/row)")
    ms = timeit(jax.jit(lambda t, i: t[i]), table1, idx)
    print(f"  gather scalar (N,): {ms:.2f} ms ({ms*1e6/N:.1f} ns/elem)")
    ms = timeit(jax.jit(lambda t, i, v: t.at[i].set(v)), table16, idx, vals16)
    print(f"  scatter rows: {ms:.2f} ms ({ms*1e6/N:.1f} ns/row)")
    ms = timeit(jax.jit(lambda t, i, v: t.at[i].min(v)), table1, idx, vals1)
    print(f"  scatter-min scalar: {ms:.2f} ms ({ms*1e6/N:.1f} ns/elem)")
    ms = timeit(jax.jit(lambda v: jnp.cumsum(v)), vals1)
    print(f"  cumsum (N,): {ms:.2f} ms")
    ms = timeit(jax.jit(lambda v: jnp.sort(v)), vals1)
    print(f"  sort (N,): {ms:.2f} ms")
    ms = timeit(jax.jit(lambda i, v: jax.lax.sort([i, v], num_keys=1)), idx, vals1)
    print(f"  sort pairs: {ms:.2f} ms")
    # contiguous block gather: G blocks of B rows via reshape-take
    G, B = 256, 2048
    blk = jax.random.randint(k1, (G,), 0, T // B, jnp.int32)
    t3 = table16.reshape(T // B, B, 16)
    ms = timeit(jax.jit(lambda t, b: t[b]), t3, blk)
    print(f"  block gather {G}x{B}x16: {ms:.2f} ms")
    upd = jax.random.normal(k3, (G, B, 16), jnp.float32)
    ms = timeit(jax.jit(lambda t, b, u: t.at[b].set(u)), t3, blk, upd)
    print(f"  block scatter {G}x{B}x16: {ms:.2f} ms")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    probe_vmem()
    probe_xla()
    probe_serial_rowgather()
    probe_serial_gather()
    probe_serial_zbuf()
