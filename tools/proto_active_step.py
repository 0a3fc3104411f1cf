"""Prototype of the active-block fusion step — cost-model validation only.

Structure (all one jit, donated map arrays):
  1. plan: dense project over full capacity -> per-block activity -> top-K
     active block ids (device-side, no host sync)
  2. gather active blocks -> active table (A slots)
  3. conflict: 2 image gathers + dense test + tombstone conf
  4. index map: 3-pass scatter-argmin zbuffer at active scale
  5. associate: 9 1D-gathers from active table at valid pixels + dense merge
  6. fuse: 9 1D-scatters back into active table
  7. writeback active blocks; append new surfels at tail (checkerboard-sliced
     cumsum + 11 scatters)
Reports ms/frame chained over N frames.
"""
import time

import jax
import jax.numpy as jnp

CAP = 1 << 22          # global capacity
B = 2048               # block size
G = CAP // B           # number of blocks
AB = 256               # active blocks
A = AB * B             # active table slots = 524288
H, W = 370, 1226
HW = H * W
INT32_MAX = jnp.iinfo(jnp.int32).max

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 16)

# global map SoA (11 columns: pos3, conf, colorsem, init_t, last_t, normal3, radius)
NCOL = 11
cols = [jax.random.normal(ks[i % 8], (CAP,)) for i in range(NCOL)]
# make "live": conf>0 for first 1.5M
live_n = 1_500_000
cols[3] = jnp.where(jnp.arange(CAP) < live_n, jnp.abs(cols[3]) + 0.5, 0.0)
# positions spread over a 200m corridor to give coherent blocks
zcorr = (jnp.arange(CAP, dtype=jnp.float32) / CAP) * 200.0
cols[0] = cols[0] * 5.0          # x
cols[1] = cols[1] * 2.0          # y
cols[2] = zcorr + cols[2]        # z grows with index (temporal coherence)

depth = jnp.abs(jax.random.normal(ks[8], (H, W))) * 10.0 + 1.0
semimg = jax.random.randint(ks[9], (H, W), 0, 19, jnp.int32)
rgbimg = jax.random.uniform(ks[10], (H, W, 3))

FX, FY, CX, CY = 707.0, 707.0, 601.0, 183.0


def project(x, y, z, cam_z_off):
    zz = z - cam_z_off
    safe = jnp.where(jnp.abs(zz) < 1e-12, 1e-12, zz)
    u = FX * x / safe + CX
    v = FY * y / safe + CY
    return u, v, zz


def step(carry, _):
    cols, cam_z, count = carry
    x, y, z, conf = cols[0], cols[1], cols[2], cols[3]

    # ---- 1. plan: dense over capacity ----
    u, v, zc = project(x, y, z, cam_z)
    live = conf > 0.0
    in_view = live & (u >= 80.0) & (u <= W) & (v >= 0) & (v <= H) & (zc > 1.0) & (zc < 45.0)
    blk_act = jnp.max(in_view.reshape(G, B), axis=1)
    # top-AB active blocks by id order: cumsum over G (tiny)
    act_ids = jnp.where(blk_act, jnp.arange(G, dtype=jnp.int32), G)
    act_sorted = jnp.sort(act_ids)[:AB]          # G=2048 sort: tiny
    blk = jnp.where(act_sorted < G, act_sorted, 0)

    # ---- 2. gather active blocks ----
    acols = [c.reshape(G, B)[blk].reshape(A) for c in cols]
    ax, ay, az, aconf = acols[0], acols[1], acols[2], acols[3]

    # ---- 3. conflict ----
    au, av, azc = project(ax, ay, az, cam_z)
    ui = jnp.clip(jnp.floor(au).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.floor(av).astype(jnp.int32), 0, H - 1)
    flat = vi * W + ui
    d = depth.reshape(-1)[flat]
    s = semimg.reshape(-1)[flat]
    ainview = (aconf > 0) & (au >= 80.0) & (au <= W) & (av >= 0) & (av <= H) & (azc > 1.0) & (azc < 30.0)
    dd = jnp.where(s == 10, 31.0, d)
    hit = ainview & (dd > azc * 1.001)
    aconf = jnp.where(hit, aconf - 1.0, aconf)

    # ---- 4. index map: 3-pass zbuffer ----
    pi = jnp.ceil(au).astype(jnp.int32) - 1
    pj = jnp.ceil(av).astype(jnp.int32) - 1
    inb = (pi >= 0) & (pi < W) & (pj >= 0) & (pj < H)
    ivalid = (aconf > 0) & inb & (azc > 0) & (azc < 30.0)
    zkey = jax.lax.bitcast_convert_type(azc.astype(jnp.float32), jnp.int32)
    zkey = jnp.where(ivalid, zkey, INT32_MAX)
    fpix = jnp.where(ivalid, pj * W + pi, HW)
    zbuf = jnp.full((HW,), INT32_MAX, jnp.int32).at[fpix].min(zkey, mode="drop")
    win = zbuf[jnp.clip(fpix, 0, HW - 1)]
    is_win = ivalid & (zkey == win)
    aids = jnp.arange(A, dtype=jnp.int32)
    idbuf = jnp.full((HW,), INT32_MAX, jnp.int32).at[
        jnp.where(is_win, fpix, HW)
    ].min(aids, mode="drop")
    idimg = jnp.where(idbuf == INT32_MAX, -1, idbuf)

    # ---- 5. associate: checkerboard-sliced pixels ----
    # checkerboard (x+y)%2==1 -> two interleaved quarters; use one slice [::1,1::2]
    ids_px = idimg.reshape(H, W)[:, 1::2].reshape(-1)     # ~HW/2
    dpx = depth[:, 1::2].reshape(-1)
    spx = semimg[:, 1::2].reshape(-1)
    rpx = rgbimg[:, 1::2].reshape(-1, 3)
    has = ids_px > 0
    safe_ids = jnp.where(has, ids_px, 0)
    g = [acols[c][safe_ids] for c in (0, 1, 2, 3, 4, 8, 9, 10)]  # 8 gathers + normal x
    gx, gy, gz, gconf, gcolor, gnx, gny, grad = g
    valid_px = has & (dpx > 1.0) & (dpx < 30.0)
    csum = gconf + 0.9
    mx = (0.9 * dpx + gconf * gx) / csum
    my = (0.9 * dpx + gconf * gy) / csum
    mz = (0.9 * dpx + gconf * gz) / csum
    mrad = jnp.minimum(grad, dpx * 0.01)
    mcol = rpx[:, 0] + gcolor * 0.0
    mark = jnp.where(valid_px, safe_ids, -1)

    # ---- 6. fuse: 9 scatters back ----
    fidx = jnp.where(valid_px, safe_ids, A)
    acols2 = list(acols)
    for ci, val in ((0, mx), (1, my), (2, mz), (3, csum), (4, mcol), (8, gnx), (9, gny), (10, mrad)):
        base = aconf if ci == 3 else acols[ci]
        acols2[ci] = base.at[fidx].set(val, mode="drop")
    acols2[3] = acols2[3].at[fidx].set(csum, mode="drop")

    # ---- 7. writeback + append ----
    ncols = []
    for c, ac in zip(cols, acols2):
        ncols.append(c.reshape(G, B).at[blk].set(ac.reshape(AB, B)).reshape(CAP))
    # append new: pixels with mark == -1 & depth valid
    newm = (~valid_px) & (dpx > 1.0) & (dpx < 30.0)
    offs = jnp.cumsum(newm.astype(jnp.int32)) - 1
    dest = count + offs
    ok = newm & (dest < CAP)
    aidx = jnp.where(ok, dest, CAP)
    n_new = jnp.maximum(offs[-1] + 1, 0)
    for ci in range(NCOL):
        src = dpx * (ci + 1.0)
        ncols[ci] = ncols[ci].at[aidx].set(src, mode="drop")
    count = count + jnp.minimum(n_new, CAP - count)
    return (ncols, cam_z + 1.0, count), n_new


import functools


@functools.partial(jax.jit, static_argnames=("n",))
def run_frames(cols, n):
    (cols, camz, count), nn = jax.lax.scan(
        step, (cols, jnp.float32(0.0), jnp.int32(live_n)), None, length=n
    )
    return count, nn, cols[3]


if __name__ == "__main__":
    NFRAMES = 10
    t0 = time.perf_counter()
    count, nn, c3 = run_frames(cols, NFRAMES)
    _ = int(count)
    print(f"first (compile+run {NFRAMES} frames): {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    count, nn, c3 = run_frames(cols, NFRAMES)
    _ = int(count)
    dt = time.perf_counter() - t0
    print(f"steady: {dt/NFRAMES*1e3:.1f} ms/frame ({NFRAMES/dt:.2f} fps)", flush=True)
