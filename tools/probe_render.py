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
        out = splat_render_fast(culled, T, cam)
        return out["rgb"].sum() + out["depth"].sum()

    @jax.jit
    def fast_nocull(c, smap, T):
        out = splat_render_fast(smap, T + c * 0, cam)
        return out["rgb"].sum() + out["depth"].sum()

    timed("cull only", cull_only, smap, T)
    timed("cull + fast render", fast_full, smap, T)
    timed("fast render, no cull", fast_nocull, smap, T)


if __name__ == "__main__":
    main()
