"""Pallas serial-loop primitive costs (fixed VMEM budgets, vreg accumulators).

P0: empty fori_loop overhead per iteration.
P1: dynamic-major block load (16,128) + one-hot extract via dot -> per-iter cost.
P2: z-buffer RMW: load (1,128) row, blend one lane by min, store back.
P3: batched row write: accumulate 128 results in a vreg, store once per 128.
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def steady(f, *args, k=6):
    y = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(y)[0]))
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(k)]
    _ = [float(jnp.sum(jax.tree.leaves(y)[0])) for y in outs]
    return (time.perf_counter() - t0) / k * 1e3


N = 1 << 19  # 524288 iterations
which = sys.argv[1] if len(sys.argv) > 1 else "all"
key = jax.random.PRNGKey(0)

if which in ("all", "p0"):
    def k0(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[0, 0]
        acc = jax.lax.fori_loop(0, N, body, jnp.float32(0))
        o_ref[0, 0] = acc

    f = pl.pallas_call(
        k0,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    x = jnp.ones((1, 1), jnp.float32)
    ms = steady(jax.jit(f), x)
    print(f"P0 empty loop: {ms:.1f} ms ({ms*1e6/N:.1f} ns/iter)", flush=True)

if which in ("all", "p1"):
    G = 4096  # table of G blocks x (16,128) = 32 MB
    table = jax.random.normal(key, (G, 16, 128), jnp.float32)
    idx = jax.random.randint(key, (N, 1), 0, G * 128, jnp.int32)

    def k1(idx_ref, table_ref, o_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

        def body(i, acc):
            ix = idx_ref[i, 0]
            g = ix // 128
            l = ix % 128
            blk = table_ref[g]  # (16,128)
            onehot = (lanes == l).astype(jnp.float32)  # (128,1)
            col = jax.lax.dot_general(
                blk, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (16,1)
            return acc + col

        acc = jax.lax.fori_loop(0, N, body, jnp.zeros((16, 1), jnp.float32))
        o_ref[:, :] = acc

    f = pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct((16, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    ms = steady(jax.jit(f), idx, table)
    print(f"P1 block load+onehot-dot extract: {ms:.1f} ms ({ms*1e6/N:.1f} ns/iter)", flush=True)

if which in ("all", "p2"):
    P = 453120
    Prow = (P + 127) // 128
    idx = jax.random.randint(key, (N, 1), 0, P, jnp.int32)
    zkey = jax.random.normal(key, (N, 1), jnp.float32)

    def k2(idx_ref, z_ref, o_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, _):
            ix = idx_ref[i, 0]
            r = ix // 128
            l = ix % 128
            zv = z_ref[i, 0]
            row = o_ref[r, :].reshape(1, 128)
            upd = jnp.where((lanes == l) & (zv < row), zv, row)
            o_ref[r, :] = upd.reshape(128)
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    f = pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((Prow, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )
    ms = steady(jax.jit(f), idx, zkey)
    print(f"P2 zbuf RMW row-blend: {ms:.1f} ms ({ms*1e6/N:.1f} ns/iter)", flush=True)

if which in ("all", "p3"):
    # scalar loads from SMEM driving vreg build, store once per 128
    G = 4096
    table = jax.random.normal(key, (G, 16, 128), jnp.float32)
    idx = jax.random.randint(key, (N, 1), 0, G * 128, jnp.int32)

    def k3(idx_ref, table_ref, o_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)

        def outer(j, _):
            def inner(t, acc):
                i = j * 128 + t
                ix = idx_ref[i, 0]
                g = ix // 128
                l = ix % 128
                blk = table_ref[g]  # (16,128) load
                col16 = jnp.sum(jnp.where(lanes == l, blk, 0.0), axis=1, keepdims=True)  # (16,1)
                return jnp.where(lanes == t, col16, acc)  # place into out lane t

            acc = jax.lax.fori_loop(0, 128, inner, jnp.zeros((16, 128), jnp.float32))
            o_ref[j] = acc
            return 0

        jax.lax.fori_loop(0, N // 128, outer, 0)

    f = pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((N // 128, 16, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((N, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    ms = steady(jax.jit(f), idx, table)
    print(f"P3 gather rows->(16,128) tiles (reduce extract, batched store): {ms:.1f} ms ({ms*1e6/N:.1f} ns/row)", flush=True)
