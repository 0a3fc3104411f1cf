"""Reproduce round-1's exact hot constructs at round-1 scale to find what is
actually slow (BENCH_r01: compact=930ms, conflict=180ms, fuse=114ms @ cap 2^22).
"""
import time

import jax
import jax.numpy as jnp

CAP = 1 << 22
H, W = 370, 1226
N_PIX = H * W


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)

# --- compact (r1 ops/fusion.py:89) ---
keep = jax.random.uniform(ks[0], (CAP,)) < 0.5
pos = jax.random.normal(ks[1], (CAP, 3))
conf = jax.random.uniform(ks[2], (CAP,))
sem = jax.random.randint(ks[3], (CAP,), 0, 19, jnp.int32)


@jax.jit
def compact_r1(keep, pos, conf, sem):
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    idx = jnp.where(keep, dest, CAP)

    def scat(src):
        return jnp.zeros_like(src).at[idx].set(src, mode="drop")

    return scat(pos), scat(conf), scat(sem)


print("compact-style (cumsum + 3 drop-scatters, cap 4.2M):", f"{timeit(compact_r1, keep, pos, conf, sem):.1f} ms")


@jax.jit
def compact_nodrop(keep, pos, conf, sem):
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    idx = jnp.where(keep, dest, CAP - 1)  # in-range, use mask-write instead

    def scat(src):
        return jnp.zeros_like(src).at[idx].set(src)

    return scat(pos), scat(conf), scat(sem)


print("compact-style (in-range idx, no drop):", f"{timeit(compact_nodrop, keep, pos, conf, sem):.1f} ms")


# vectorized alternative: single fused take along sorted order
@jax.jit
def compact_take(keep, pos, conf, sem):
    # argsort of (!keep) is a stable partition permutation
    perm = jnp.argsort(~keep, stable=True)
    return pos[perm], conf[perm], sem[perm]


print("compact via stable argsort+take:", f"{timeit(compact_take, keep, pos, conf, sem):.1f} ms")

# --- conflict gather (r1 ops/fusion.py:73-76): depth[vi, ui] 2D advanced indexing ---
depth = jax.random.uniform(ks[4], (H, W))
semimg = jax.random.randint(ks[5], (H, W), 0, 19, jnp.int32)
vi = jax.random.randint(ks[6], (CAP,), 0, H, jnp.int32)
ui = jax.random.randint(ks[7], (CAP,), 0, W, jnp.int32)


@jax.jit
def gather2d(depth, semimg, vi, ui):
    return depth[vi, ui], semimg[vi, ui]


print("2D image gather (4.2M):", f"{timeit(gather2d, depth, semimg, vi, ui):.1f} ms")


@jax.jit
def gather_flat(depth, semimg, vi, ui):
    f = vi * W + ui
    return depth.reshape(-1)[f], semimg.reshape(-1)[f]


print("flat image gather (4.2M):", f"{timeit(gather_flat, depth, semimg, vi, ui):.1f} ms")

# --- fuse scatter (r1): 453k updates into cap-sized arrays, 8 arrays, drop mode ---
mark = jax.random.randint(ks[0], (N_PIX,), -10, 1 << 20, jnp.int32)
vals3 = jax.random.normal(ks[1], (N_PIX, 3))
vals1 = jax.random.uniform(ks[2], (N_PIX,))


@jax.jit
def fuse_r1(pos, conf, mark, vals3, vals1):
    write = mark >= 0
    idx = jnp.where(write, mark, CAP)
    return (
        pos.at[idx].set(vals3, mode="drop"),
        conf.at[idx].set(vals1, mode="drop"),
    )


print("fuse-style drop-scatter (453k->4.2M, 2 arrays):", f"{timeit(fuse_r1, pos, conf, mark, vals3, vals1):.1f} ms")

# --- append (r1): column-major flat + cumsum over pixels + scatter ---
validp = jax.random.uniform(ks[3], (H, W)) < 0.25


@jax.jit
def append_r1(pos, validp, vals3):
    v = jnp.swapaxes(validp, 0, 1).reshape(-1)
    offs = jnp.cumsum(v.astype(jnp.int32)) - 1
    dest = 100000 + offs
    ok = v & (dest < CAP)
    idx = jnp.where(ok, dest, CAP)
    src = jnp.swapaxes(vals3.reshape(H, W, 3), 0, 1).reshape(-1, 3)
    return pos.at[idx].set(src, mode="drop")


print("append-style (453k cumsum + scatter into 4.2M):", f"{timeit(append_r1, pos, validp, vals3):.1f} ms")

# --- index map scatter-argmin (r1 index_map.py) at 4.2M surfels ---
z = jax.random.uniform(ks[4], (CAP,), minval=0.1, maxval=30.0)
valid = jax.random.uniform(ks[5], (CAP,)) < 0.1
flatpix = jax.random.randint(ks[6], (CAP,), 0, N_PIX, jnp.int32)
INT32_MAX = jnp.iinfo(jnp.int32).max


@jax.jit
def indexmap_r1(flatpix, z, valid):
    keyb = jax.lax.bitcast_convert_type(z, jnp.int32)
    keyb = jnp.where(valid, keyb, INT32_MAX)
    idx = jnp.where(valid, flatpix, N_PIX)
    depth_buf = jnp.full((N_PIX,), INT32_MAX, jnp.int32)
    depth_buf = depth_buf.at[idx].min(keyb, mode="drop")
    win = depth_buf[jnp.clip(idx, 0, N_PIX - 1)]
    is_win = valid & (keyb == win)
    ids = jnp.arange(CAP, dtype=jnp.int32)
    id_buf = jnp.full((N_PIX,), INT32_MAX, jnp.int32)
    id_buf = id_buf.at[jnp.where(is_win, idx, N_PIX)].min(ids, mode="drop")
    return jnp.where(id_buf == INT32_MAX, -1, id_buf)


print("index-map scatter-argmin (4.2M surfels):", f"{timeit(indexmap_r1, flatpix, z, valid):.1f} ms")
