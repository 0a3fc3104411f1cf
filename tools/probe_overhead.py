"""Separate per-dispatch tunnel overhead from device compute.

a) trivial chained step x50 -> per-dispatch overhead floor
b) full fusion step chained x20 at two active budgets -> scatter scaling
c) packed int64 single-pass z-buffer vs two-pass int32 microbench
"""
import time

import jax
import jax.numpy as jnp

from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam
from surfelmapping_tpu.pipeline import SurfelMapper


def sync(x):
    _ = float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def chained(name, f, x0, k=20):
    x = f(x0)
    sync(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(k):
        x = f(x)
    sync(x)
    dt = (time.perf_counter() - t0) / k * 1e3
    print(f"{name:36s} {dt:8.2f} ms/call", flush=True)
    return dt


def main():
    # a) dispatch overhead floor
    big = jnp.zeros((1 << 23,), jnp.float32)
    f_triv = jax.jit(lambda x: x + 1.0)
    chained("trivial chained (8M add)", f_triv, big, k=50)
    tiny = jnp.zeros((8,), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    chained("trivial chained (8 elt)", f_tiny, tiny, k=50)

    # c) z-buffer strategies over A source elements -> num_pix targets
    A = 1 << 20
    num_pix = 453620
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    zkey = jax.random.randint(k1, (A,), 0, 1 << 30, jnp.int32)
    fpix = jax.random.randint(k2, (A,), 0, num_pix, jnp.int32)

    def two_pass(c):
        zk = zkey + c.astype(jnp.int32)
        depth_buf = jnp.full((num_pix,), 2**31 - 1, jnp.int32).at[fpix].min(zk)
        win = depth_buf[fpix]
        ids = jnp.arange(A, dtype=jnp.int32)
        id_buf = jnp.full((num_pix,), 2**31 - 1, jnp.int32)
        id_buf = id_buf.at[jnp.where(zk == win, fpix, num_pix)].min(ids, mode="drop")
        return id_buf.astype(jnp.float32)

    def one_pass64(c):
        zk = zkey + c.astype(jnp.int32)
        ids = jnp.arange(A, dtype=jnp.int32)
        packed = (zk.astype(jnp.int64) << 21) | ids.astype(jnp.int64)
        buf = jnp.full((num_pix,), 2**62, jnp.int64).at[fpix].min(packed)
        return (buf & ((1 << 21) - 1)).astype(jnp.float32)

    def one_pass32_q(c):
        # quantized: 13-bit depth key << 19 | id (A <= 512k)
        zk = (zkey >> 17) + c.astype(jnp.int32)
        ids = jnp.arange(A, dtype=jnp.int32)
        packed = (zk << 20) | (ids >> 0)  # A=1M needs 20 bits; 11-bit depth
        buf = jnp.full((num_pix,), 2**31 - 1, jnp.int32).at[fpix].min(packed)
        return (buf & ((1 << 20) - 1)).astype(jnp.float32)

    c0 = jnp.float32(0.0)
    for name, fn in [("zbuf two-pass i32", two_pass), ("zbuf one-pass i64", one_pass64), ("zbuf one-pass i32 quant", one_pass32_q)]:
        f = jax.jit(lambda c, fn=fn: jnp.sum(fn(c)) * 0.0)
        chained(name, f, c0, k=20)

    # gather cost scaling: 226k gathers from 1M table, 9 columns
    tbl = jax.random.normal(key, (A,), jnp.float32)
    gidx = jax.random.randint(k2, (226810,), 0, A, jnp.int32)

    def gath9(c):
        s = c
        idx = gidx + c.astype(jnp.int32) % 2
        for _ in range(9):
            s = s + jnp.sum(tbl[idx])
        return s

    chained("9x 226k gathers from 1M", jax.jit(gath9), c0, k=20)

    def scat10(c):
        out = c
        idx = gidx + c.astype(jnp.int32) % 2
        for _ in range(10):
            out = out + jnp.sum(jnp.zeros((A,), jnp.float32).at[idx].set(1.0))
        return out

    chained("10x 226k scatters into 1M", jax.jit(scat10), c0, k=20)

    # b) full fusion step at two active budgets
    cam = kitti_cam()
    params = PipelineParams()
    for ab in (512, 128):
        mapper = SurfelMapper(cam, params, MapConfig(capacity=1 << 23, active_blocks=ab), sync_every=16)
        scene = SyntheticScene(cam, step=0.8)
        frames = [mapper.stage_frame(*scene.frame(i)) for i in range(40)]
        for i in range(30):
            mapper.process_frame(*frames[i])
        _ = mapper.count
        t0 = time.perf_counter()
        for i in range(30, 40):
            mapper.process_frame(*frames[i])
        _ = mapper.count
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"fusion step active_blocks={ab:4d} (eff {mapper._effective_active_blocks}) {dt:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
