"""Per-stage profiling of the fusion step on real hardware (dev tool)."""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam
from surfelmapping_tpu.pipeline import SurfelMapper
from surfelmapping_tpu.ops.preprocess import preprocess_frame, remove_movings
from surfelmapping_tpu.ops.fusion import conflict_pass, compact, fuse_scatter, append_new
from surfelmapping_tpu.ops.index_map import build_index_map
from surfelmapping_tpu.ops.association import associate
from surfelmapping_tpu.ops.transforms import compose, invert_se3


def timeit(name, fn, *args, n=5):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1e3:9.2f} ms")
    return r


def main():
    cam = kitti_cam()
    params = PipelineParams()
    mapper = SurfelMapper(cam, params, MapConfig(capacity=1 << 22))
    scene = SyntheticScene(cam, step=0.8)
    for i in range(6):
        rgb, d, s, T = scene.frame(i)
        mapper.process_frame(rgb, d, s, T)
    jax.block_until_ready(mapper.smap.pos)
    print(f"capacity={mapper.smap.capacity} count={int(mapper.smap.count)}")

    rgb, d, s, T = scene.frame(6)
    rgb, d, s, T = mapper._to_device(rgb, d, s, T)
    smap = mapper.smap
    tm = jnp.float32(mapper.tick)
    T_inv = invert_se3(T)
    T_c2l = compose(invert_se3(mapper.last_pose), T)

    prep = jax.jit(functools.partial(preprocess_frame, cam=cam, params=params))
    depth_f = timeit("preprocess_frame", prep, d, s)
    mov = jax.jit(functools.partial(remove_movings, cam=cam, params=params))
    depth_m = timeit("remove_movings", mov, depth_f, s, mapper.last_depth, T_c2l)

    conf_fn = jax.jit(functools.partial(
        conflict_pass, cam=cam, params=params, min_depth=params.near_clip,
        max_depth=params.far_clip, fuse_thresh=params.fuse_thresh_factor,
        is_clean=False))
    timeit("conflict_pass", conf_fn, smap, depth_m, s, T_inv)

    timeit("compact", jax.jit(compact), smap)

    idx_fn = jax.jit(functools.partial(build_index_map, cam=cam, params=params))
    idx_img = timeit("build_index_map", idx_fn, smap, T_inv, tm)

    assoc_fn = jax.jit(functools.partial(associate, cam=cam, params=params))
    assoc = timeit("associate", assoc_fn, depth_m, rgb, s, idx_img, smap, T, T_inv, tm)

    timeit("fuse_scatter", jax.jit(fuse_scatter), smap, assoc)
    timeit("append_new", jax.jit(append_new), smap, assoc)


if __name__ == "__main__":
    main()
