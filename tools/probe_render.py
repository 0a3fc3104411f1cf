"""Attribute the fast-splatter render time at the full bench map."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam
from surfelmapping_tpu.ops.splat import cull_for_render, splat_render_fast
from surfelmapping_tpu.pipeline import SurfelMapper


def timed(name, fn, *args, iters=5):
    c = fn(jnp.float32(0), *args)
    _ = float(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(iters):
        c = fn(c * 1e-30, *args)
    _ = float(c)
    print(f"{name:28s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


def main():
    cam = kitti_cam()
    params = PipelineParams()
    mapper = SurfelMapper(
        cam, params,
        MapConfig(capacity=1 << 23, active_blocks=512, freeze_active_budget=True),
        sync_every=16,
    )
    scene = SyntheticScene(cam, step=0.8)
    n = 100
    frames = [mapper.stage_frame(*scene.frame(i)) for i in range(n)]
    for i in range(n):
        mapper.process_frame(*frames[i])
    smap = mapper.smap
    T = jnp.asarray(scene.frame(n // 2)[3], jnp.float32)
    G = smap.capacity // 2048
    print(f"map: {mapper.count} surfels, {G} blocks", flush=True)

    @jax.jit
    def cull_only(c, smap, T):
        culled, gids, n_active = cull_for_render(
            smap, T + c * 0, cam, G, 2048, 200.0, 7
        )
        return culled.px.sum() + n_active.astype(jnp.float32)

    @jax.jit
    def fast_full(c, smap, T):
        culled, gids, n_active = cull_for_render(
            smap, T + c * 0, cam, G, 2048, 200.0, 7
        )
        out = splat_render_fast(
            culled, T, cam, n_valid=jnp.minimum(n_active, G) * 2048
        )
        return out["rgb"].sum() + out["depth"].sum()

    @jax.jit
    def fast_nocull(c, smap, T):
        out = splat_render_fast(smap, T + c * 0, cam)
        return out["rgb"].sum() + out["depth"].sum()

    # finer stages of the fast splatter (duplicated math, kept in sync with
    # ops/splat.py:splat_render_fast — probe only)
    from surfelmapping_tpu.ops.index_map import _depth_key
    from surfelmapping_tpu.ops.pallas_zbuf import zbuffer_argmin_auto
    from surfelmapping_tpu.ops.transforms import (
        invert_se3, normalize_planar, rotate_planar, transform_planar,
    )

    H, W = cam.height, cam.width
    num_pix = H * W
    classes = (1, 2, 3, 5)

    def project_and_class(smap, view):
        T_inv = invert_se3(view)
        px, py, pz = transform_planar(T_inv, smap.px, smap.py, smap.pz)
        nx, ny, nz = normalize_planar(
            *rotate_planar(T_inv, smap.nx, smap.ny, smap.nz)
        )
        active = smap.live_mask() & (smap.conf > 0.0) & (pz > 1.0) & (pz < 200.0)
        far_mode = pz > 5.0
        dot_en = px * nx + py * ny + pz * nz
        elen = jnp.sqrt(px * px + py * py + pz * pz)
        cosang = dot_en / jnp.maximum(elen, 1e-12)
        rad_eff = jnp.where(
            far_mode, smap.radius, smap.radius / (1.0 + 0.5 * jnp.abs(cosang))
        )
        f = max(cam.fx, cam.fy)
        safe_z = jnp.maximum(pz, 1.0)
        rd = f * rad_eff / safe_z
        cls = jnp.full((smap.capacity,), len(classes) - 1, jnp.int32)
        for ci in range(len(classes) - 2, -1, -1):
            cls = jnp.where(rd <= classes[ci], ci, cls)
        uc = cam.fx * px / safe_z + cam.cx
        vc = cam.fy * py / safe_z + cam.cy
        pi0 = jnp.floor(uc).astype(jnp.int32)
        pj0 = jnp.floor(vc).astype(jnp.int32)
        inb = (pi0 >= 0) & (pi0 < W) & (pj0 >= 0) & (pj0 < H)
        ok = active & inb
        flat = jnp.where(ok, pj0 * W + pi0, num_pix)
        key = _depth_key(pz, ok)
        cflat = jnp.where(ok, cls * num_pix + flat, len(classes) * num_pix)
        return key, cflat

    @jax.jit
    def proj_only(c, smap, T):
        culled, gids, n_active = cull_for_render(
            smap, T + c * 0, cam, G, 2048, 200.0, 7
        )
        key, cflat = project_and_class(culled, T)
        return jnp.sum(key).astype(jnp.float32) + jnp.sum(cflat)

    @jax.jit
    def proj_zbuf(c, smap, T):
        culled, gids, n_active = cull_for_render(
            smap, T + c * 0, cam, G, 2048, 200.0, 7
        )
        key, cflat = project_and_class(culled, T)
        zb, ib = zbuffer_argmin_auto(
            key, cflat, len(classes) * num_pix, replicas=1,
            n_valid=jnp.minimum(n_active, G) * 2048,
        )
        return jnp.sum(zb).astype(jnp.float32) + jnp.sum(ib)

    timed("cull only", cull_only, smap, T)
    timed("cull + proj/class", proj_only, smap, T)
    timed("cull + proj + zbuffer", proj_zbuf, smap, T)
    timed("cull + fast render", fast_full, smap, T)
    timed("fast render, no cull", fast_nocull, smap, T)


if __name__ == "__main__":
    main()
