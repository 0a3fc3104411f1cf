"""Splat renderer checks: geometry round-trip (render the fused map from the
mapping pose and compare depth/semantics against the input frame) and
hole semantics (class+1, 0 = hole — draw_image_adaptive.geom:35)."""

import numpy as np
import jax.numpy as jnp

from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, tiny_cam
from surfelmapping_tpu.ops.splat import splat_render
from surfelmapping_tpu.pipeline import SurfelMapper


import functools


@functools.cache
def _render_fn():
    import jax
    cam = tiny_cam()
    return jax.jit(lambda m, T: splat_render(m, T, cam, footprint=3))


def _render(smap, T):
    return _render_fn()(smap, T)


def build_small_map(n_frames=3):
    cam = tiny_cam()
    # merging enabled so in-view surfels survive the conflict pass and the
    # rendered view is densely covered (reference default fuse_thresh=0
    # kills ~half the in-view surfels every frame)
    m = SurfelMapper(cam, PipelineParams(fuse_thresh_factor=0.05),
                     MapConfig(capacity=1 << 15))
    scene = SyntheticScene(cam)
    frames = [scene.frame(i) for i in range(n_frames)]
    for rgb, d, s, T in frames:
        m.process_frame(rgb, d, s, T)
    return m, scene, frames


def test_render_depth_matches_input():
    m, scene, frames = build_small_map()
    rgb, d, s, T = frames[1]
    out = _render(m.smap, jnp.asarray(T, jnp.float32))
    depth = np.asarray(out["depth"])
    d_m = d.astype(np.float32) / 1000.0
    # candidate pixels: valid input depth within the mapped range, right of
    # the stereo border (nothing is ever ingested left of it)
    # distant ground fails the reference's 0.15 m support test (depth changes
    # z^2/(f*h) per row), so only the near field is ever ingested: restrict
    # candidates to it
    cand = (d_m > 1.5) & (d_m < 6.0)
    cand[:, :80] = False
    mask = (depth > 0) & cand
    assert mask.sum() > 0.3 * cand.sum(), (
        f"render hit only {mask.sum()}/{cand.sum()} mappable pixels"
    )
    err = np.abs(depth[mask] - d_m[mask])
    assert np.median(err) < 0.3, f"median depth error {np.median(err):.3f} m"


def test_render_semantic_offset_and_holes():
    m, scene, frames = build_small_map()
    rgb, d, s, T = frames[1]
    out = _render(m.smap, jnp.asarray(T, jnp.float32))
    sem = np.asarray(out["semantic"])
    # hole value is 0; everything else is class+1
    vals = np.unique(sem)
    assert 0 in vals
    input_classes = set(np.unique(s).tolist())
    for v in vals:
        if v == 0:
            continue
        assert (v - 1) in input_classes
    # empty map renders all holes
    from surfelmapping_tpu.surfels import empty_map

    out_empty = splat_render(empty_map(64), jnp.eye(4, dtype=jnp.float32), m.cam,
                             footprint=3)
    assert int(np.asarray(out_empty["semantic"]).sum()) == 0
    assert int(np.asarray(out_empty["id"]).max()) == -1


def test_render_rgb_colors_match_scene():
    m, scene, frames = build_small_map()
    rgb, d, s, T = frames[1]
    out = _render(m.smap, jnp.asarray(T, jnp.float32))
    r = np.asarray(out["rgb"])
    sem = np.asarray(out["semantic"])
    hit = sem > 0
    if hit.any():
        # rendered colors must be within the scene's 8-bit color lattice range
        assert r[hit].min() >= 0.0 and r[hit].max() <= 1.0
        assert (r[hit].sum(-1) > 0).mean() > 0.95


def test_bucketed_render_matches_single_window():
    """The small/large footprint bucketing must not change a single winner
    (it only re-partitions which window evaluates each splat), and the
    culled render_view path must reproduce the full-map render exactly."""
    import jax

    from surfelmapping_tpu.ops.splat import render_view, splat_render

    m, scene, frames = build_small_map(4)
    rgb, d, s, T = frames[2]
    T = jnp.asarray(T, jnp.float32)
    smap = m.smap
    single = splat_render(smap, T, m.cam, footprint=4, small_footprint=None)
    bucketed = splat_render(smap, T, m.cam, footprint=4, small_footprint=2)
    assert int(bucketed["large_overflow"]) == 0
    for k in ("rgb", "semantic", "depth", "id"):
        np.testing.assert_array_equal(
            np.asarray(single[k]), np.asarray(bucketed[k]), err_msg=k
        )

    # The culled program is a different XLA executable (different capacity)
    # so FMA/reassociation can flip candidates sitting within float-eps of
    # the disc's a^2+b^2 <= 0.5 boundary — equal-depth tie swaps only.
    # Depth must match everywhere; id/color swaps allowed on <1% of pixels.
    culled = render_view(smap, T, m.cam, footprint=4, small_footprint=2,
                         block_size=256, start_blocks=4, method="exact")
    d_diff = (
        np.abs(np.asarray(single["depth"]) - np.asarray(culled["depth"]))
        > 1e-3
    ).mean()
    assert d_diff < 0.01, f"{d_diff:.2%} of depths changed"
    id_flips = (np.asarray(single["id"]) != np.asarray(culled["id"])).mean()
    assert id_flips < 0.01, f"{id_flips:.2%} of winner ids changed"


def test_fast_splatter_matches_exact_renderer():
    """The production point-sprite path (splat_render_fast) must stay close
    to the exact ray/plane renderer: high PSNR on mutual hits, near-equal
    coverage, small depth error."""
    from surfelmapping_tpu.metrics import psnr
    from surfelmapping_tpu.ops.splat import splat_render_fast

    m, scene, frames = build_small_map(4)
    rgb, d, s, T = frames[2]
    T = jnp.asarray(T, jnp.float32)
    smap = m.smap
    exact = splat_render(smap, T, m.cam, footprint=5)
    fast = splat_render_fast(smap, T, m.cam, footprint=5)

    he = np.asarray(exact["semantic"]) > 0
    hf = np.asarray(fast["semantic"]) > 0
    both = he & hf
    # coverage within a few percent of each other
    assert abs(he.mean() - hf.mean()) < 0.05, (he.mean(), hf.mean())
    assert both.sum() > 0.9 * he.sum()
    p = psnr(np.asarray(fast["rgb"]), np.asarray(exact["rgb"]), both)
    assert p > 25.0, f"fast-vs-exact PSNR {p:.2f} dB"
    derr = np.abs(np.asarray(fast["depth"]) - np.asarray(exact["depth"]))[both]
    assert np.median(derr) < 0.05, f"median depth diff {np.median(derr):.3f} m"


def test_render_psnr_parity():
    """Parity guard (VERDICT r3 #4): rendering the fused map at a mapping
    pose must reproduce the input frame above a PSNR floor on hit pixels,
    with substantial coverage — renders can't silently rot."""
    from surfelmapping_tpu.metrics import psnr

    m, scene, frames = build_small_map(4)
    rgb, d, s, T = frames[2]
    out = _render(m.smap, jnp.asarray(T, jnp.float32))
    rendered = np.asarray(out["rgb"])
    hits = np.asarray(out["semantic"]) > 0
    frame = rgb.astype(np.float64) / 255.0
    # only the near field right of the stereo border is ever ingested
    # (tiny_cam is 128 px wide with the reference's 80 px border; the
    # support filter rejects the distant ground) — measure coverage there
    d_m = d.astype(np.float64) / 1000.0
    ingestible = (d_m > 1.5) & (d_m < 6.0)
    ingestible[:, :80] = False
    hit_frac = float(hits[ingestible].mean())
    p = psnr(rendered, frame, hits)
    assert hit_frac > 0.3, f"hit fraction on ingestible region {hit_frac:.3f}"
    assert p > 20.0, f"PSNR on hits {p:.2f} dB"
