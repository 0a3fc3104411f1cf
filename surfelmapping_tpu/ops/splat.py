"""Novel-view surfel splatting: RGB / semantic / depth images from any pose.

TPU-native re-expression of the reference's rasterized quad-splat renderer
(draw_image.vert + draw_image_adaptive.geom + draw_image.frag,
src/GlobalModel.cpp:782-833).  The GL pipeline emits a camera-facing or
normal-oriented quad per surfel, interpolates a texcoord, and discards
fragments outside the unit disc.  Because each splat quad is planar,
perspective-correct interpolation of its texcoord equals a ray/plane
intersection — so the TPU renderer computes, for every pixel in a bounded
footprint around the projected surfel center, the exact intersection of the
pixel ray with the splat plane and applies the same inside-disc test.  The
z-buffer is the same two-pass scatter-argmin used by the index map.

Cost model (round-4 rework): the naive form paid
(2R+1)^2 x 2 scatter passes over the FULL map capacity and kept all per-
offset hit tensors alive (~2 GB at a 4 M map).  Now:

  * :func:`cull_for_render` gathers only the in-frustum active blocks
    (ops/active.py machinery) into a compact working map first — per-view
    cost scales with in-frustum surfels, not capacity;
  * splats are split into a SMALL bucket (projected extent fits a
    (2*small_r+1)^2 window — the vast majority: the radius model
    surfels.glsl:19-32 bounds the re-view extent near 2*sqrt2 px at the
    mapping focal length, and most in-frustum surfels are seen from farther
    than they were created) processed in place, and a LARGE bucket packed
    into a capacity/8 side table that alone pays the full footprint window;
    large-bucket overflow falls back to the small window (cropped splat,
    counted — never silently dropped);
  * pass 2 recomputes the per-offset intersections instead of retaining
    them (FLOPs are free next to the HBM the stored hits cost).

Geometry reproduced from draw_image_adaptive.geom:
  * surfels with camera z > 5 m render as view-aligned discs of radius
    r*sqrt2 half-diagonal (lines 45-50);
  * nearer surfels render normal-oriented with foreshortened radius
    r / (1 + 0.5|cos angle|) (lines 51-60);
  * active gate 1 < z < maxDepth, maxDepth = 200 (GlobalModel.cpp:806);
  * color output is the surfel RGB, semantic output is class+1 with 0
    reserved for holes (draw_image_adaptive.geom:35).

Divergence (documented): GL interpolates depth screen-linearly across the
quad; we use the true geometric depth of the plane intersection.  For splats
a few pixels wide the difference is far below the z-buffer's discrimination
needs.

All per-surfel math is planar (component columns) — see surfels.py for why
(N,3) stacks are banned on TPU.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics
from ..surfels import SurfelMap
from .colors import decode_color
from .index_map import INT32_MAX, _depth_key
from .transforms import invert_se3, normalize_planar, rotate_planar, transform_planar

SQRT2 = 1.41421356237


def _splat_frames(px, py, pz, nx, ny, nz, radius):
    """Per-surfel splat plane: returns (X axis, Y axis, plane normal) as
    planar component triples, in the render camera frame."""
    far_mode = pz > 5.0

    # near (oriented) branch
    dot_en = px * nx + py * ny + pz * nz
    elen = jnp.sqrt(px * px + py * py + pz * pz)
    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    cosang = dot_en / jnp.maximum(elen * nlen, 1e-12)
    rad_near = radius / (1.0 + 0.5 * jnp.abs(cosang))
    # x_near = normalize((n.y - n.z, -n.x, n.x)) * rad_near*sqrt2
    ax, ay, az = normalize_planar(ny - nz, -nx, nx)
    sn = rad_near * SQRT2
    xnx, xny, xnz = ax * sn, ay * sn, az * sn
    # y_near = cross(n, x_near)
    ynx = ny * xnz - nz * xny
    yny = nz * xnx - nx * xnz
    ynz = nx * xny - ny * xnx

    # far (view-aligned) branch: X = (-1,0,0)*r*sqrt2, Y = (0,-1,0)*r*sqrt2
    sf = radius * SQRT2
    Xx = jnp.where(far_mode, -sf, xnx)
    Xy = jnp.where(far_mode, 0.0, xny)
    Xz = jnp.where(far_mode, 0.0, xnz)
    Yx = jnp.where(far_mode, 0.0, ynx)
    Yy = jnp.where(far_mode, -sf, yny)
    Yz = jnp.where(far_mode, 0.0, ynz)

    # plane normal = normalize(cross(X, Y))
    pnx, pny, pnz = normalize_planar(
        Xy * Yz - Xz * Yy, Xz * Yx - Xx * Yz, Xx * Yy - Xy * Yx
    )
    return (Xx, Xy, Xz), (Yx, Yy, Yz), (pnx, pny, pnz)


@functools.partial(
    jax.jit, static_argnames=("cam", "num_blocks", "block_size", "max_depth", "margin")
)
def cull_for_render(
    smap: SurfelMap,
    view: jax.Array,
    cam: CameraIntrinsics,
    num_blocks: int,
    block_size: int = 2048,
    max_depth: float = 200.0,
    margin: int = 8,
):
    """Gather the surfel blocks visible from ``view`` into a compact map.

    A surfel can only write pixels within ``margin`` px of its projected
    center (the splat window crops there), so blocks whose surfels all
    project outside the padded image — or outside (1, max_depth) — can never
    contribute; the per-view render then costs O(in-frustum), not
    O(capacity).  Returns (culled_map, global_ids i32[A], n_active blocks);
    if n_active > num_blocks the LOWEST-id (oldest-appended) blocks were
    dropped — same keep-the-tail rule as plan_active_blocks; distance is
    never computed (the caller re-culls with a grown budget — render_view
    and load_map.py do, so truncation never survives)."""
    from .active import gather_active

    T_inv = invert_se3(view)
    G = smap.capacity // block_size
    px, py, pz = transform_planar(T_inv, smap.px, smap.py, smap.pz)
    safe_z = jnp.where(jnp.abs(pz) < 1e-12, 1e-12, pz)
    u = cam.fx * px / safe_z + cam.cx
    v = cam.fy * py / safe_z + cam.cy
    live = smap.conf > 0.0
    vis = (
        live
        & (pz > 1.0)
        & (pz < max_depth)
        & (u >= -margin)
        & (u <= cam.width + margin)
        & (v >= -margin)
        & (v <= cam.height + margin)
    )
    blk_act = jnp.any(vis.reshape(G, block_size), axis=1)
    n_active = jnp.sum(blk_act.astype(jnp.int32))
    ids = jnp.where(blk_act, jnp.arange(G, dtype=jnp.int32), -1)
    ids = jnp.sort(ids)
    chosen = ids[-num_blocks:]
    # valid blocks first (see plan_active_blocks): the splatter streams only
    # the live prefix through the z-buffer kernel
    blk = jnp.sort(jnp.where(chosen >= 0, chosen, G))
    at = gather_active(smap, blk, block_size)
    culled = SurfelMap(
        px=at.x, py=at.y, pz=at.z, conf=jnp.where(at.slot_valid, at.conf, 0.0),
        colorsem=at.colorsem, init_t=at.init_t, last_t=at.last_t,
        nx=at.nx, ny=at.ny, nz=at.nz, radius=at.radius,
        count=jnp.int32(at.size),
    )
    return culled, at.global_id, n_active


def splat_render(
    smap: SurfelMap,
    view: jax.Array,
    cam: CameraIntrinsics,
    max_depth: float = 200.0,
    footprint: int = 5,
    small_footprint: int = 2,
    large_frac: int = 8,
) -> dict[str, jax.Array]:
    """Render the map from camera-to-world pose ``view``.

    Returns dict with:
      rgb:      f32[H,W,3] in [0,1] (0 where no surfel)
      semantic: i32[H,W]   class+1, 0 = hole (reference convention)
      depth:    f32[H,W]   camera-frame z of the winning splat, 0 = hole
      id:       i32[H,W]   winning surfel id, -1 = hole
      large_overflow: i32  splats that exceeded the large-bucket budget and
                           rendered cropped to the small window

    ``footprint`` bounds the per-surfel pixel radius (the large bucket);
    splats whose projected extent fits ``small_footprint`` (the vast
    majority) only pay the small window.  Pass ``small_footprint=None`` to
    force the single-window path (identical output unless the large bucket
    overflowed; tests assert the equivalence).
    """
    T_inv = invert_se3(view)
    H, W = cam.height, cam.width
    num_pix = H * W
    N = smap.capacity

    px, py, pz = transform_planar(T_inv, smap.px, smap.py, smap.pz)
    nx, ny, nz = normalize_planar(*rotate_planar(T_inv, smap.nx, smap.ny, smap.nz))
    # conf > 0 also excludes tombstoned surfels awaiting deferred compaction
    active = smap.live_mask() & (smap.conf > 0.0) & (pz > 1.0) & (pz < max_depth)

    (Xx, Xy, Xz), (Yx, Yy, Yz), (pnx, pny, pnz) = _splat_frames(
        px, py, pz, nx, ny, nz, smap.radius
    )
    inv_x2 = 1.0 / jnp.maximum(Xx * Xx + Xy * Xy + Xz * Xz, 1e-18)
    inv_y2 = 1.0 / jnp.maximum(Yx * Yx + Yy * Yy + Yz * Yz, 1e-18)
    n_dot_p = pnx * px + pny * py + pnz * pz

    safe_z = jnp.where(jnp.abs(pz) < 1e-12, 1e-12, pz)
    uc = cam.fx * px / safe_z + cam.cx
    vc = cam.fy * py / safe_z + cam.cy
    pi0 = jnp.floor(uc).astype(jnp.int32)
    pj0 = jnp.floor(vc).astype(jnp.int32)

    cols = dict(
        px=px, py=py, pz=pz, Xx=Xx, Xy=Xy, Xz=Xz, Yx=Yx, Yy=Yy, Yz=Yz,
        pnx=pnx, pny=pny, pnz=pnz, inv_x2=inv_x2, inv_y2=inv_y2,
        n_dot_p=n_dot_p, pi0=pi0, pj0=pj0,
    )

    def offset_hit(c, ok_base, dj, di):
        qpx = c["pi0"] + di
        qpy = c["pj0"] + dj
        # pixel ray through (px+0.5, py+0.5)
        dx = (qpx.astype(jnp.float32) + 0.5 - cam.cx) / cam.fx
        dy = (qpy.astype(jnp.float32) + 0.5 - cam.cy) / cam.fy
        denom = c["pnx"] * dx + c["pny"] * dy + c["pnz"]
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        t = c["n_dot_p"] / denom
        qx = t * dx - c["px"]
        qy = t * dy - c["py"]
        qz = t - c["pz"]
        a = (qx * c["Xx"] + qy * c["Xy"] + qz * c["Xz"]) * c["inv_x2"]
        b = (qx * c["Yx"] + qy * c["Yy"] + qz * c["Yz"]) * c["inv_y2"]
        inside = (a * a + b * b) <= 0.5
        inb = (qpx >= 0) & (qpx < W) & (qpy >= 0) & (qpy < H)
        ok = ok_base & inside & inb & (t > 0.0) & (t < max_depth)
        flat = jnp.where(ok, qpy * W + qpx, num_pix)
        return flat, t, ok

    # ---- bucket split ----------------------------------------------------
    if small_footprint is None or small_footprint >= footprint:
        large_overflow_n = jnp.int32(0)
        buckets = [(cols, active, jnp.arange(N, dtype=jnp.int32), footprint)]
    else:
        # conservative projected half-extent in px: the disc's pixel radius
        # is <= f * |axis| / z with |axis| = rad*sqrt2; +1 covers the
        # floor()/pixel-center offsets
        axis_len = jnp.sqrt(
            jnp.maximum(Xx * Xx + Xy * Xy + Xz * Xz,
                        Yx * Yx + Yy * Yy + Yz * Yz)
        )
        f = max(cam.fx, cam.fy)
        rd = f * axis_len / jnp.maximum(pz, 1.0)
        is_small = rd <= (small_footprint - 0.999)
        is_large = active & ~is_small
        AL = max(N // large_frac, 256)
        lpos = jnp.cumsum(is_large.astype(jnp.int32)) - 1
        n_large = jnp.maximum(lpos[-1] + 1, 0)
        over = is_large & (lpos >= AL)
        large_overflow_n = jnp.sum(over.astype(jnp.int32))
        dest = jnp.where(is_large & ~over, lpos, AL)
        lids = jnp.full((AL,), -1, jnp.int32).at[dest].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop"
        )
        lsafe = jnp.clip(lids, 0, N - 1)
        lcols = {k: v[lsafe] for k, v in cols.items()}
        lok = lids >= 0
        # overflowed larges render cropped through the small window rather
        # than disappearing
        small_ok = active & (is_small | over)
        buckets = [
            (cols, small_ok, jnp.arange(N, dtype=jnp.int32), small_footprint),
            (lcols, lok, lsafe, footprint),
        ]

    # Offset loops run as lax.scan over the (dj, di) table: a Python loop
    # unrolls (2R+1)^2 scatter stages whose recomputed intersection
    # intermediates XLA keeps live simultaneously — footprint 8 at a 4.4 M
    # map planned 79.9 GB of HBM (measured r5).  The scan bounds residency
    # to ONE offset's tensors.
    def offsets_of(R):
        d = jnp.arange(-R, R + 1, dtype=jnp.int32)
        return jnp.stack(
            [jnp.repeat(d, 2 * R + 1), jnp.tile(d, 2 * R + 1)], axis=1
        )

    # ---- pass 1: depth z-buffer -----------------------------------------
    depth_buf = jnp.full((num_pix,), INT32_MAX, jnp.int32)
    for c, okb, ids, R in buckets:
        def p1(buf, dji, c=c, okb=okb):
            flat, t, ok = offset_hit(c, okb, dji[0], dji[1])
            return buf.at[flat].min(_depth_key(t, ok), mode="drop"), None

        depth_buf, _ = jax.lax.scan(p1, depth_buf, offsets_of(R))

    # ---- pass 2: winner ids (ties -> smallest id; GL leaves ties to draw
    # order).  Intersections recomputed — cheaper than retaining
    # (2R+1)^2 hit tensors in HBM.
    id_buf = jnp.full((num_pix,), INT32_MAX, jnp.int32)
    for c, okb, ids, R in buckets:
        def p2(buf, dji, c=c, okb=okb, ids=ids):
            flat, t, ok = offset_hit(c, okb, dji[0], dji[1])
            key = _depth_key(t, ok)
            win = ok & (key == depth_buf[jnp.clip(flat, 0, num_pix - 1)])
            return buf.at[jnp.where(win, flat, num_pix)].min(
                ids, mode="drop"
            ), None

        id_buf, _ = jax.lax.scan(p2, id_buf, offsets_of(R))

    hole = id_buf == INT32_MAX
    wid = jnp.where(hole, 0, id_buf)
    w_rgb, w_sem = decode_color(smap.colorsem[wid])
    rgb = jnp.where(hole[:, None], 0.0, w_rgb).reshape(H, W, 3)
    sem = jnp.where(hole, 0, w_sem.astype(jnp.int32) + 1).reshape(H, W)
    depth_f = jax.lax.bitcast_convert_type(depth_buf, jnp.float32)
    depth_img = jnp.where(hole, 0.0, depth_f).reshape(H, W)
    id_img = jnp.where(hole, -1, id_buf).reshape(H, W)
    return {
        "rgb": rgb, "semantic": sem, "depth": depth_img, "id": id_img,
        "large_overflow": large_overflow_n,
    }


def splat_render_fast(
    smap: SurfelMap,
    view: jax.Array,
    cam: CameraIntrinsics,
    max_depth: float = 200.0,
    footprint: int = 5,
    classes: tuple[int, ...] = (1, 2, 3, 5),
    n_valid: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Point-sprite splatter: each surfel scatters ONCE (depth pass + id
    pass), and the footprint spreading happens as dense disc-shaped
    min-dilations of the per-class center buffers — per-view cost is
    2 x N scattered elements + a few hundred shifted image ops, instead of
    the exact path's 2 x N x (2R+1)^2.

    Documented divergences from the exact ray/plane renderer (both are
    approximations of the GL rasterizer; the reference's own legacy
    splat.vert point-sprite pipeline made the same trade):
      * constant depth across a splat (no ray/plane variation);
      * circular stamps — no foreshortened-ellipse shape for tilted discs;
      * footprint radius quantized UP to the next class in ``classes``
        (slightly larger splats), cropped at ``footprint``.

    tests/test_render.py asserts PSNR parity against the exact renderer.
    Returns the same dict as :func:`splat_render` (large_overflow = count
    of splats cropped at the last class).
    """
    T_inv = invert_se3(view)
    H, W = cam.height, cam.width
    num_pix = H * W
    N = smap.capacity

    px, py, pz = transform_planar(T_inv, smap.px, smap.py, smap.pz)
    nx, ny, nz = normalize_planar(*rotate_planar(T_inv, smap.nx, smap.ny, smap.nz))
    active = smap.live_mask() & (smap.conf > 0.0) & (pz > 1.0) & (pz < max_depth)

    # per-surfel disc pixel radius: the exact splat's disc half-extent is
    # |X|*sqrt(0.5) = rad (near) or rad*sqrt2*sqrt0.5 (far); use the same
    # foreshortened radius model
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

    classes = tuple(c for c in classes if c <= footprint) or (footprint,)
    cls = jnp.full((N,), len(classes) - 1, jnp.int32)
    for ci in range(len(classes) - 2, -1, -1):
        cls = jnp.where(rd <= classes[ci], ci, cls)
    large_overflow = jnp.sum(
        (active & (rd > classes[-1])).astype(jnp.int32)
    )

    uc = cam.fx * px / safe_z + cam.cx
    vc = cam.fy * py / safe_z + cam.cy
    pi0 = jnp.floor(uc).astype(jnp.int32)
    pj0 = jnp.floor(vc).astype(jnp.int32)
    # centers outside the image are dropped (the dilation buffers are
    # image-sized; splats centered off-image lose their partial border
    # coverage — a documented border-only divergence)
    inb = (pi0 >= 0) & (pi0 < W) & (pj0 >= 0) & (pj0 < H)
    ok = active & inb
    flat = jnp.where(ok, pj0 * W + pi0, num_pix)
    key = _depth_key(pz, ok)

    NC = len(classes)
    # per-class center z-buffers + winner ids in ONE Pallas streaming pass
    # on TPU (ops/pallas_zbuf.py; replicas=1 because the 4-class buffer pair
    # is 14.5 MB of VMEM — the outputs ARE the working buffers).  Novel
    # views scatter in near-RANDOM pixel order where the XLA path costs
    # ~232 ns per candidate vs the kernel's ~22 (measured r5) — this pass
    # was ~2/3 of the 0.3-0.5 s render.  XLA fallback elsewhere, identical
    # semantics (candidate index == surfel id here).
    from .pallas_zbuf import zbuffer_argmin_auto

    cflat = jnp.where(ok, cls * num_pix + flat, NC * num_pix)
    zbuf, idbuf = zbuffer_argmin_auto(
        key, cflat, NC * num_pix, replicas=1, n_valid=n_valid
    )

    zimg = zbuf.reshape(NC, H, W)
    iimg = idbuf.reshape(NC, H, W)

    key_out = jnp.full((H, W), INT32_MAX, jnp.int32)
    id_out = jnp.full((H, W), INT32_MAX, jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    colsi = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    for ci2, R in enumerate(classes):
        zk = zimg[ci2]
        ik = iimg[ci2]
        for dj in range(-R, R + 1):
            for di in range(-R, R + 1):
                if dj * dj + di * di > (R + 0.5) ** 2:
                    continue  # disc-shaped stamp
                sk = jnp.roll(jnp.roll(zk, dj, axis=0), di, axis=1)
                si = jnp.roll(jnp.roll(ik, dj, axis=0), di, axis=1)
                src_ok = (rows - dj >= 0) & (rows - dj < H) & \
                         (colsi - di >= 0) & (colsi - di < W)
                sk = jnp.where(src_ok, sk, INT32_MAX)
                better = sk < key_out
                tie = (sk == key_out) & (si < id_out)
                take = better | tie
                key_out = jnp.where(take, sk, key_out)
                id_out = jnp.where(take, si, id_out)

    hole = id_out.reshape(-1) == INT32_MAX
    wid = jnp.where(hole, 0, id_out.reshape(-1))
    w_rgb, w_sem = decode_color(smap.colorsem[wid])
    rgb = jnp.where(hole[:, None], 0.0, w_rgb).reshape(H, W, 3)
    sem = jnp.where(hole, 0, w_sem.astype(jnp.int32) + 1).reshape(H, W)
    depth_f = jax.lax.bitcast_convert_type(key_out.reshape(-1), jnp.float32)
    depth_img = jnp.where(hole, 0.0, depth_f).reshape(H, W)
    id_img = jnp.where(hole, -1, id_out.reshape(-1)).reshape(H, W)
    return {
        "rgb": rgb, "semantic": sem, "depth": depth_img, "id": id_img,
        "large_overflow": large_overflow,
    }


def render_view(
    smap: SurfelMap,
    view: jax.Array,
    cam: CameraIntrinsics,
    max_depth: float = 200.0,
    footprint: int = 5,
    small_footprint: int = 2,
    block_size: int = 2048,
    start_blocks: int | None = None,
    method: str = "fast",
    classes: tuple[int, ...] = (1, 2, 3, 5),
) -> dict[str, jax.Array]:
    """Cull + render, growing the cull budget until nothing is truncated
    (host loop; each budget size is one jit executable).  The ``id`` image
    is translated back to ORIGINAL map slot ids.

    ``method``: "fast" = point-sprite splatter (splat_render_fast; the
    production path — per-view cost 2 x in-frustum surfels), "exact" =
    ray/plane disc renderer (splat_render; the quality reference the tests
    pin the fast path against).

    The whole cull+render is ONE jitted dispatch; truncation is checked
    AFTER the outputs return (one scalar read) and only a truncated view
    re-renders with a grown budget.  ``start_blocks`` is the cull-budget
    hint: None starts at the full block count (no retry ever — the right
    default for one-off renders); view loops should feed the previous
    view's ``out["n_active_blocks"]`` back in (rounded up) so repeated
    renders pay only the in-frustum size.  Each budget size is its own XLA
    executable, so hints are bucketed to powers of two."""
    if smap.capacity % block_size:
        # block culling needs whole blocks; pad with dead slots (conf 0).
        # Loaded maps arrive at raw count capacity (surfels.load_map).
        pad = block_size - smap.capacity % block_size
        smap = dataclasses.replace(
            smap,
            **{
                k: jnp.pad(getattr(smap, k), (0, pad))
                for k in ("px", "py", "pz", "conf", "colorsem", "init_t",
                          "last_t", "nx", "ny", "nz", "radius")
            },
        )
    G = max(smap.capacity // block_size, 1)
    if start_blocks is None:
        budget = G
    else:
        # pow2 bucket so feed-forward hints reuse executables; near-full
        # hints collapse to the full-budget executable (each bucket is its
        # own multi-second XLA compile — a 2048 bucket next to G=2148
        # would recompile for a 5% saving)
        budget = 1
        while budget < start_blocks:
            budget *= 2
        budget = G if budget >= G // 2 else budget
    while True:
        out, n_active = _cull_and_render(
            smap, view, cam, budget, block_size, max_depth, footprint,
            small_footprint, method, classes,
        )
        if int(n_active) <= budget or budget >= G:
            out["n_active_blocks"] = n_active
            return out
        while budget < int(n_active):
            budget *= 2
        budget = min(budget, G)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cam", "num_blocks", "block_size", "max_depth", "footprint",
        "small_footprint", "method", "classes",
    ),
)
def _cull_and_render(
    smap: SurfelMap,
    view: jax.Array,
    cam: CameraIntrinsics,
    num_blocks: int,
    block_size: int,
    max_depth: float,
    footprint: int,
    small_footprint: int | None,
    method: str,
    classes: tuple[int, ...] = (1, 2, 3, 5),
):
    culled, gids, n_active = cull_for_render(
        smap, view, cam, num_blocks, block_size, max_depth,
        margin=footprint + 2,
    )
    if method == "fast":
        # the culled table orders valid blocks first: stream only that
        # prefix through the z-buffer kernel (a pow2 budget can pad the
        # tail beyond the live content)
        nv = jnp.minimum(n_active, num_blocks) * block_size
        out = splat_render_fast(
            culled, view, cam, max_depth, footprint, classes=classes,
            n_valid=nv,
        )
    else:
        # the exact method is the correctness/quality reference: single
        # window, no footprint buckets (the bucket side-table budget scales
        # with the CULLED size and could overflow -> cropped splats)
        out = splat_render(
            culled, view, cam, max_depth, footprint, small_footprint=None
        )
    idl = out["id"]
    out["id"] = jnp.where(
        idl >= 0, gids[jnp.clip(idl, 0, gids.shape[0] - 1)], -1
    )
    return out, n_active
