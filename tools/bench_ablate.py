"""In-pipeline stage attribution: run the REAL bench loop with one stage
stubbed out, and read the cost off the fps delta.

This is the only methodology that survives the deferred-dispatch tunnel
(microbenchmarks lie: block_until_ready is a no-op, unchained repeats may
never execute, standalone jits lose fusion).  The map is built unpatched
for the first 10 frames, then the chosen op is stubbed, the step cache is
cleared (one recompile), and frames 10..30 are timed exactly like bench.py
window 1.

Usage: python tools/bench_ablate.py <variant>
Variants: full stub_preprocess stub_conflict stub_index stub_assoc
          stub_fuseappend stub_plan
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import surfelmapping_tpu.pipeline as P
from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam
from surfelmapping_tpu.ops.active import AssocFlat
from surfelmapping_tpu.ops.preprocess import metricize_depth


def make_stub(variant, cam, params):
    if variant == "full":
        return None, None
    if variant == "stub_preprocess":
        return "preprocess_frame", (
            lambda d, s, cam, params: metricize_depth(d, cam, params)
        )
    if variant == "stub_conflict":
        return "conflict_active", (
            lambda at, *a, **k: (at, jnp.int32(0))
        )
    if variant == "stub_index":
        fa = params.index_factor
        H, W = cam.height * fa, cam.width * fa

        return "index_active", (
            lambda at, *a, **k: jnp.full((H, W), -1, jnp.int32)
        )
    if variant == "stub_assoc":
        Vp = cam.height * cam.width // 2

        def stub(depth, rgb, semantic, idx, at, *a, **k):
            z = jnp.zeros((Vp,), jnp.float32)
            return AssocFlat(
                x=z, y=z, z=z, conf=z, colorsem=z, init_t=z, last_t=z,
                nx=z, ny=z, nz=z, radius=z,
                mark=jnp.full((Vp,), -10, jnp.int32),
            )

        return "associate_active", stub
    if variant == "stub_fuseappend":
        return "fuse_append_map", (
            lambda smap, at, assoc, B: (smap, jnp.int32(0))
        )
    if variant == "stub_plan":
        def stub(smap, T_inv, cam_, params_, num_blocks, block_size):
            blk = jnp.arange(num_blocks, dtype=jnp.int32)
            return blk, jnp.int32(num_blocks)

        return "plan_active_blocks", stub
    raise SystemExit(f"unknown variant {variant}")


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    cam = kitti_cam()
    params = PipelineParams()
    mapper = P.SurfelMapper(cam, params, MapConfig(capacity=1 << 23), sync_every=16)
    scene = SyntheticScene(cam, step=0.8)
    frames = [mapper.stage_frame(*scene.frame(i)) for i in range(60)]
    for i in range(10):
        mapper.process_frame(*frames[i])
    _ = mapper.count

    name, stub = make_stub(variant, cam, params)
    if name is not None:
        setattr(P, name, stub)
        P._fusion_step.clear_cache()
    # warm through several sync windows so every executable (step, sync,
    # deferred compaction, budget bucket) is compiled before the timer
    for i in range(10, 40):
        mapper.process_frame(*frames[i])
        if i % 8 == 0:
            mapper._refresh_counts()
    mapper._refresh_counts()
    mapper._compact_now()

    t0 = time.perf_counter()
    for i in range(40, 60):
        mapper.process_frame(*frames[i])
    n = mapper.count
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{variant:16s} {dt:8.2f} ms/frame   surfels={n}")


if __name__ == "__main__":
    main()
