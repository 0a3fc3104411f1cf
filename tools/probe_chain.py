"""Chained-dependency timing: per-iteration slope is the true device cost.

y_{k+1} = f(y_k) sequenced on device; total time vs iteration count gives the
real per-op cost independent of dispatch pipelining; host readback at the end
forces completion.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)


def slope_ms(step, y0, counts=(4, 16)):
    res = []
    for n in counts:
        y = y0
        # warm
        y = step(y)
        np.asarray(jax.device_get(jnp.sum(y)))
        y = y0
        t0 = time.perf_counter()
        for _ in range(n):
            y = step(y)
        s = float(jnp.sum(y))  # forces the chain
        dt = time.perf_counter() - t0
        res.append((n, dt))
    (n1, t1), (n2, t2) = res
    return (t2 - t1) / (n2 - n1) * 1e3, s


# matmul chain 4096^3 f32 = 137 GFLOP/iter
M = 4096
b = jax.random.normal(key, (M, M), jnp.bfloat16) * 0.01
step_mm = jax.jit(lambda y: (y @ b).astype(jnp.bfloat16))
y0 = jax.random.normal(key, (M, M), jnp.bfloat16)
ms, _ = slope_ms(step_mm, y0)
print(f"matmul chain 4096^3 bf16: {ms:.2f} ms/iter -> {2*M**3/ms/1e9:.0f} TFLOP/s")

# argsort chain 4.2M
CAP = 1 << 22
xs = jax.random.normal(key, (CAP,))
step_sort = jax.jit(lambda y: jnp.sort(y) * 1.0001 + 1e-6)
ms, _ = slope_ms(step_sort, xs)
print(f"sort chain 4.2M: {ms:.2f} ms/iter")

# scatter chain: compact-like with drop mode, 3-wide
pos = jax.random.normal(key, (CAP, 3))
idx = jax.random.randint(key, (CAP,), 0, CAP, jnp.int32)


@jax.jit
def step_scat(y):
    out = jnp.zeros_like(y).at[idx].set(y, mode="drop")
    return out + 1e-6


ms, _ = slope_ms(step_scat, pos)
print(f"drop-scatter chain 4.2Mx3: {ms:.2f} ms/iter")

# gather chain: image gather 4.2M
H, W = 370, 1226
vi = jax.random.randint(key, (CAP,), 0, H, jnp.int32)
ui = jax.random.randint(key, (CAP,), 0, W, jnp.int32)


@jax.jit
def step_gather(y):
    img = y[:H * W].reshape(H, W)
    g = img[vi, ui]
    return y.at[:CAP].add(g * 1e-9)


ms, _ = slope_ms(step_gather, xs)
print(f"image-gather chain 4.2M: {ms:.2f} ms/iter")

# elementwise chain baseline
step_ew = jax.jit(lambda y: y * 1.0000001 + 1e-9)
ms, _ = slope_ms(step_ew, pos)
print(f"elementwise chain 4.2Mx3: {ms:.2f} ms/iter")

# cumsum chain
step_cs = jax.jit(lambda y: jnp.cumsum(y) * 1e-6 + y * 0.5)
ms, _ = slope_ms(step_cs, xs)
print(f"cumsum chain 4.2M: {ms:.2f} ms/iter")

# dispatch latency: tiny op roundtrip
tiny = jnp.ones((8, 128))
step_t = jax.jit(lambda y: y + 1.0)
t0 = time.perf_counter()
for _ in range(20):
    tiny = step_t(tiny)
    float(jnp.sum(tiny))
print(f"tiny op + host sync roundtrip: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
