"""Timing sanity checks: vary inputs across iterations; known-cost matmul."""
import time

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)


def timeit_varying(fn, make_args, n=10, warmup=2):
    args_list = [make_args(i) for i in range(n + warmup)]
    for i in range(warmup):
        out = fn(*args_list[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for i in range(warmup, warmup + n):
        outs.append(fn(*args_list[i]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


# sanity: 8192^3 bf16 matmul = 1.1 TFLOP; v5e peak ~197 TFLOP/s bf16 -> ~5.6ms
M = 8192
a = jax.random.normal(key, (M, M), jnp.bfloat16)
b = jax.random.normal(key, (M, M), jnp.bfloat16)
mm = jax.jit(lambda x, y: x @ y)
ms = timeit_varying(mm, lambda i: (a + jnp.bfloat16(i), b), n=5)
print(f"matmul 8192^3 bf16: {ms:.2f} ms -> {2*M**3/ms/1e9:.0f} TFLOP/s")

# same-args version (cache suspicion)
for _ in range(2):
    out = mm(a, b)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(5):
    out = mm(a, b)
jax.block_until_ready(out)
ms2 = (time.perf_counter() - t0) / 5 * 1e3
print(f"matmul same-args: {ms2:.2f} ms")

# argsort 4.2M with varying inputs
CAP = 1 << 22
xs = jax.random.normal(key, (CAP,))
srt = jax.jit(lambda x: jnp.argsort(x))
ms = timeit_varying(srt, lambda i: (xs + i,), n=5)
print(f"argsort 4.2M varying: {ms:.2f} ms")

# scatter 4.2M varying
idx = jax.random.randint(key, (CAP,), 0, CAP, jnp.int32)
pos = jax.random.normal(key, (CAP, 3))
scat = jax.jit(lambda p, i: jnp.zeros_like(p).at[i].set(p, mode="drop"))
ms = timeit_varying(scat, lambda i: (pos + i, idx), n=5)
print(f"drop-scatter 4.2M x3 varying: {ms:.2f} ms")

# gather 4.2M from image varying
H, W = 370, 1226
img = jax.random.uniform(key, (H, W))
vi = jax.random.randint(key, (CAP,), 0, H, jnp.int32)
ui = jax.random.randint(key, (CAP,), 0, W, jnp.int32)
g = jax.jit(lambda im, v, u: im[v, u])
ms = timeit_varying(g, lambda i: (img + i, vi, ui), n=5)
print(f"2D image gather 4.2M varying: {ms:.2f} ms")

# elementwise baseline: read+write 4.2M*3 f32
ew = jax.jit(lambda p: p * 2.0 + 1.0)
ms = timeit_varying(ew, lambda i: (pos + i,), n=5)
print(f"elementwise 4.2Mx3: {ms:.2f} ms")
