"""Active-block fusion engine: per-frame cost O(in-frustum surfels), not
O(map capacity).

Round 1 re-expressed every reference pass (conflict.vert, index_map.vert,
data.vert, fuse.vert, unstable.vert — src/GlobalModel.cpp:246-637) as
full-capacity gathers/scatters; measured on TPU those cost ~5-10 ns *per
index*, so a 4M-slot buffer paid ~1.5 s/frame.  This module restructures the
frame so indexed memory traffic only ever touches the *active working set*:

  1. ``plan_active_blocks``  — one dense, fully-vectorized pass over the whole
     map (pure VPU math, ~0.25 ms per 4M slots) computes per-surfel view/
     conflict gates and reduces them to per-*block* activity (block = 2048
     contiguous slots).  Because surfels are appended in scan order, spatial
     locality makes frustum residency efficient at block granularity — this
     is the single-chip form of the north star's block-partitioned map.
  2. ``gather_active``       — gathers the (few hundred) active blocks into a
     fixed-size *active table* of flat 1D attribute arrays (1D layout matters:
     XLA TPU gathers cost per-row on 2D tables but per-element on 1D arrays).
  3. conflict / index / associate / fuse run on the active table with the
     exact reference semantics (same gates, marks, quirks as ops/fusion.py,
     ops/index_map.py, ops/association.py — cited per function below).
  4. ``writeback_active``    — scatters the active blocks back; new surfels
     append at the map tail in the reference's column-major lattice order.

Removal is deferred: conflict marks surfels dead by driving conf <= 0
(tombstones) instead of compacting every frame; dead surfels are excluded
from every gate, and ops/fusion.py:compact reclaims them at capacity-growth /
checkpoint / clean boundaries.  The surviving-surfel ORDER after a deferred
compact is identical to the reference's per-frame back-mapping because both
preserve relative order and appends are always at the tail.

Parity notes vs the reference:
  * conflict has NO timeDelta gate (conflict.vert tests every in-view surfel);
    activity planning therefore keys on view-frustum membership, not age, so
    full conflict parity is preserved (unlike an age-based hot/cold split).
  * the ``id > 0`` quirk (surfel 0 unmatchable: data.vert:142, exempt from
    conflict: conflict.geom id>0 filter) is applied on *global* slot ids
    before the index scatter, so it survives the active-table renumbering.
  * the index image produced here holds ACTIVE-table positions (so the
    association gathers stay at active scale); consumers needing global ids
    translate via ``ActiveTable.global_id``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, PipelineParams
from ..surfels import SurfelMap
from .frame_surfels import association_candidates, ray_geometry
from .index_map import INT32_MAX, _depth_key
from .transforms import transform_planar


# ---------------------------------------------------------------------------
# Checkerboard slicing (the reference's 1/2-sparse lattice, data.vert:88)
# ---------------------------------------------------------------------------

def checkerboard_flat(img: jax.Array) -> jax.Array:
    """Extract the (x+y)%2==1 checkerboard pixels of an [H,W,...] image as a
    flat [(H*W)//2, ...] array in EXACT column-major lattice order (u outer,
    v inner) — the reference's uv feedback-lattice traversal
    (src/FeedbackBuffer.cpp:43-59), so appended surfels get identical ids.

    Requires even H and W (KITTI is 1226x370; pad odd inputs upstream).
    """
    H, W = img.shape[:2]
    if H % 2 or W % 2:
        raise ValueError(f"checkerboard_flat needs even dims, got {H}x{W}")
    # factor the stride-2 phases out with a reshape BEFORE transposing: the
    # full-image transpose + double-strided slice lowered ~3x slower on TPU
    # than slicing unit-stride phases of the (H/2, 2, W/2, 2) view and
    # transposing the quarter-size phase images (tools probe: 30.5 -> 9.8 ms
    # for 12 KITTI images; outputs bit-identical)
    rest = img.shape[2:]
    v = img.reshape((H // 2, 2, W // 2, 2) + rest)
    a = jnp.swapaxes(v[:, 1, :, 0], 0, 1)  # u even -> v odd   (W/2, H/2, ...)
    b = jnp.swapaxes(v[:, 0, :, 1], 0, 1)  # u odd  -> v even  (W/2, H/2, ...)
    inter = jnp.stack([a, b], axis=1)      # (W/2, 2, H/2, ...)
    return inter.reshape((W * H // 2,) + rest)


# ---------------------------------------------------------------------------
# Active table
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ActiveTable:
    """The gathered in-frustum working set as flat 1D columns (A slots).

    ``colorsem`` packs rgb+semantic into one float via color.glsl's bit
    layout so the per-pixel association crossing moves 1 value instead of 4.
    ``global_id`` maps active slot -> map slot; ``blk`` holds the gathered
    block ids (out-of-range entries = inactive padding).  ``slot_valid`` masks
    padding slots (their gathered contents are clamp-garbage).
    """

    x: jax.Array          # f32[A]
    y: jax.Array          # f32[A]
    z: jax.Array          # f32[A]
    conf: jax.Array       # f32[A]
    colorsem: jax.Array   # f32[A] packed (sem<<24|r<<16|g<<8|b)
    init_t: jax.Array     # f32[A]
    last_t: jax.Array     # f32[A]
    nx: jax.Array         # f32[A]
    ny: jax.Array         # f32[A]
    nz: jax.Array         # f32[A]
    radius: jax.Array     # f32[A]
    global_id: jax.Array  # i32[A]
    slot_valid: jax.Array  # bool[A]
    blk: jax.Array        # i32[AB]

    @property
    def size(self) -> int:
        return self.x.shape[0]

    def pos(self) -> jax.Array:
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    def normal(self) -> jax.Array:
        return jnp.stack([self.nx, self.ny, self.nz], axis=-1)


def _conflict_gates(
    u: jax.Array, v: jax.Array, z: jax.Array,
    cam: CameraIntrinsics, params: PipelineParams,
    min_depth: float, max_depth: float,
) -> jax.Array:
    """conflict.vert:34 in-view test (inclusive upper bounds, stereo border).
    Shared by planning and the conflict pass so the two can never diverge
    (round-1 duplicated this inline in parallel/sharded.py — now both import
    here)."""
    return (
        (u >= params.stereo_border)
        & (u <= cam.width)
        & (v >= 0)
        & (v <= cam.height)
        & (z > min_depth)
        & (z < max_depth)
    )


def _project(px, py, pz, T_inv: jax.Array, cam: CameraIntrinsics):
    x, y, z = transform_planar(T_inv, px, py, pz)
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = cam.fx * x / safe_z + cam.cx
    v = cam.fy * y / safe_z + cam.cy
    return x, y, z, u, v


def _active_block_mask(
    smap: SurfelMap,
    T_inv: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    block_size: int,
) -> jax.Array:
    """bool[G] per-block activity: any live surfel in the block passes the
    conflict in-view gate (conflict.vert:34) OR the index-map candidate gate
    (index_map.vert projection + pixel bounds; the timeDelta gate is
    deliberately NOT applied — stale in-view surfels must still reach the
    conflict pass)."""
    G = smap.capacity // block_size
    _, _, pc_z, u, v = _project(smap.px, smap.py, smap.pz, T_inv, cam)
    live = smap.conf > 0.0
    confl = _conflict_gates(u, v, pc_z, cam, params, params.near_clip, params.far_clip)
    # index candidacy: rasterizable pixel + depth-range clip (index_map.py:104)
    fa = params.index_factor
    pi = jnp.ceil(u * fa).astype(jnp.int32) - 1
    pj = jnp.ceil(v * fa).astype(jnp.int32) - 1
    idxg = (
        (pi >= 0) & (pi < cam.width * fa) & (pj >= 0) & (pj < cam.height * fa)
        & (pc_z > 0.0) & (pc_z < params.far_clip)
    )
    act = (live & (confl | idxg)).reshape(G, block_size)
    return jnp.any(act, axis=1)


def plan_active_blocks(
    smap: SurfelMap,
    T_inv: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    num_blocks: int,
    block_size: int,
) -> tuple[jax.Array, jax.Array]:
    """Dense O(capacity) vector pass -> the <=num_blocks active block ids.

    Returns (blk i32[num_blocks] ascending, with G = capacity/block_size as
    the invalid filler; n_active = total active block count — the host
    compares it to num_blocks to grow/shrink the budget at the next sync).
    On overflow the highest-id (most recently appended, most likely relevant)
    blocks are kept — and the host's batched window verify
    (pipeline.SurfelMapper._repair_overflow) detects the truncation from the
    per-frame n_active stats and replays the window with a grown budget.
    """
    G = smap.capacity // block_size
    blk_act = _active_block_mask(smap, T_inv, cam, params, block_size)
    n_active = jnp.sum(blk_act.astype(jnp.int32))
    ids = jnp.where(blk_act, jnp.arange(G, dtype=jnp.int32), -1)
    ids = jnp.sort(ids)                      # inactive (-1) first, actives ascending
    chosen = ids[-num_blocks:]               # most recent blocks win on overflow
    # ACTIVE blocks first (ascending), G fillers last: consumers stream only
    # the valid prefix (the Pallas z-buffer takes n_valid as a dynamic
    # bound), and global_id stays monotone over the valid slots so every
    # min-id tie-break is unchanged
    blk = jnp.sort(jnp.where(chosen >= 0, chosen, G))
    return blk, n_active


def gather_active(smap: SurfelMap, blk: jax.Array, block_size: int) -> ActiveTable:
    """Contiguous block gather into flat 1D active columns.

    Block-granular 2D gathers cost per-ROW on TPU, so at 2048-slot rows this
    whole gather (13 columns x few hundred blocks) is ~0.3 ms.
    """
    B = block_size
    G = smap.capacity // B

    def g1(arr):
        return arr.reshape(G, B)[blk].reshape(-1)

    offs = jnp.arange(B, dtype=jnp.int32)[None, :]
    gid = (blk[:, None] * B + offs).reshape(-1)
    slot_valid = jnp.repeat(blk < G, B)
    return ActiveTable(
        x=g1(smap.px), y=g1(smap.py), z=g1(smap.pz),
        conf=g1(smap.conf),
        colorsem=g1(smap.colorsem),
        init_t=g1(smap.init_t),
        last_t=g1(smap.last_t),
        nx=g1(smap.nx), ny=g1(smap.ny), nz=g1(smap.nz),
        radius=g1(smap.radius),
        global_id=gid,
        slot_valid=slot_valid,
        blk=blk,
    )


def writeback_active(smap: SurfelMap, at: ActiveTable, block_size: int) -> SurfelMap:
    """Scatter the (possibly fused/tombstoned) active blocks back into the
    map.  init_t is never modified by conflict/fuse (merges keep the old
    initTime, data.vert:186) so it is not written back."""
    B = block_size
    G = smap.capacity // B
    AB = at.blk.shape[0]
    blk = at.blk

    def s1(dst, col):
        return dst.reshape(G, B).at[blk].set(col.reshape(AB, B), mode="drop").reshape(-1)

    return dataclasses.replace(
        smap,
        px=s1(smap.px, at.x), py=s1(smap.py, at.y), pz=s1(smap.pz, at.z),
        conf=s1(smap.conf, at.conf),
        colorsem=s1(smap.colorsem, at.colorsem),
        last_t=s1(smap.last_t, at.last_t),
        nx=s1(smap.nx, at.nx), ny=s1(smap.ny, at.ny), nz=s1(smap.nz, at.nz),
        radius=s1(smap.radius, at.radius),
    )


# ---------------------------------------------------------------------------
# Conflict (free-space violation) on the active table
# ---------------------------------------------------------------------------

def conflict_active(
    at: ActiveTable,
    depth: jax.Array,
    semantic: jax.Array,
    T_inv: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    min_depth: float,
    max_depth: float,
    fuse_thresh: float,
    is_clean: bool,
    gid_offset: jax.Array | int = 0,
) -> tuple[ActiveTable, jax.Array]:
    """conflict.vert/.geom + update_conf (src/GlobalModel.cpp:396-515) on the
    active table.  Exact math of ops/fusion.py:conflict_pass; the conf
    decrement tombstones the surfel (removed later by a deferred compact).

    Returns (table, n_removed) where n_removed counts surfels whose conf
    crossed <= 0 this pass (the reference's ``last - offset`` removed count).
    """
    p = params
    H, W = cam.height, cam.width
    x, y, z, u, v = _project(at.x, at.y, at.z, T_inv, cam)
    in_view = _conflict_gates(u, v, z, cam, p, min_depth, max_depth)

    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xl = x / safe_z
    yl = y / safe_z
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)

    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 1)
    flat = vi * W + ui
    # fold the sky/hole depth substitutions into the image DENSELY first so
    # only ONE per-surfel gather is needed (conflict.vert:49-58 semantics)
    hole = depth if is_clean else jnp.where(depth == 0.0, max_depth + 20.0, depth)
    deff = jnp.where(semantic == p.sky_class, max_depth + 1.0, hole)
    d = deff.reshape(-1)[flat]

    violates = (d * lam - z * lam) > (fuse_thresh * z)
    live = at.slot_valid & (at.conf > 0.0)
    # id>0: surfel 0 exempt (conflict.geom:17), applied on the GLOBAL id
    # (gid_offset shifts shard-local ids to global in the sharded step)
    hit = live & (at.global_id + gid_offset > 0) & in_view & violates
    new_conf = jnp.where(hit, at.conf - p.conflict_conf_decrement, at.conf)
    n_removed = jnp.sum(hit & (new_conf <= 0.0))
    return dataclasses.replace(at, conf=new_conf), n_removed


# ---------------------------------------------------------------------------
# Index map on the active table
# ---------------------------------------------------------------------------

def index_candidates(
    at: ActiveTable,
    T_inv: jax.Array,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    gid_offset: jax.Array | int = 0,
) -> tuple[jax.Array, jax.Array]:
    """The per-surfel half of predictIndices: depth key + target pixel.

    Gates follow ops/index_map.py:build_index_map (z>0, z<farClip, timeDelta
    freshness, pixel bounds) plus: conf>0 (tombstones are "already removed" —
    the reference compacted before rendering the index map) and global id>0
    (surfel 0 is unmatchable in data.vert:142; excluding it at the source is
    behaviorally identical and survives active renumbering).

    Returns (zkey i32[A] monotone in depth with INT32_MAX = invalid,
    fpix i32[A] flat pixel index with H*W for invalid)."""
    factor = params.index_factor
    icam = cam.scaled(factor)
    H, W = icam.height, icam.width
    _, _, z, u, v = _project(at.x, at.y, at.z, T_inv, icam)
    fresh = (time - at.last_t) <= params.time_delta
    pi = jnp.ceil(u).astype(jnp.int32) - 1
    pj = jnp.ceil(v).astype(jnp.int32) - 1
    inb = (pi >= 0) & (pi < W) & (pj >= 0) & (pj < H)
    valid = (
        at.slot_valid & (at.conf > 0.0) & (at.global_id + gid_offset > 0)
        & fresh & (z > 0.0) & (z < params.far_clip) & inb
    )
    key = _depth_key(z, valid)
    fpix = jnp.where(valid, pj * W + pi, H * W)
    return key, fpix


def index_resolve(
    zkey: jax.Array,
    fpix: jax.Array,
    ids: jax.Array,
    num_pix: int,
    depth_buf: jax.Array | None = None,
    empty_to_minus1: bool = True,
) -> jax.Array:
    """The z-buffer half of predictIndices: winner ``ids`` per pixel (flat
    i32[num_pix], -1 = empty).  ``depth_buf`` lets a distributed caller
    inject the pmin-combined depth image between the two passes; with
    ``empty_to_minus1=False`` empties stay INT32_MAX so the result can feed a
    further pmin across devices."""
    if depth_buf is None:
        depth_buf = jnp.full((num_pix,), INT32_MAX, jnp.int32).at[fpix].min(
            zkey, mode="drop"
        )
    valid = zkey != INT32_MAX
    win = depth_buf[jnp.clip(fpix, 0, num_pix - 1)]
    is_win = valid & (zkey == win)
    id_buf = jnp.full((num_pix,), INT32_MAX, jnp.int32)
    id_buf = id_buf.at[jnp.where(is_win, fpix, num_pix)].min(ids, mode="drop")
    if not empty_to_minus1:
        return id_buf
    return jnp.where(id_buf == INT32_MAX, -1, id_buf)


def index_active(
    at: ActiveTable,
    T_inv: jax.Array,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    allow_pallas: bool = True,
) -> jax.Array:
    """predictIndices (src/IndexMap.cpp:138-198) over the active table:
    i32[H*F, W*F] image of ACTIVE slot positions (-1 = empty).

    On TPU the z-buffer resolves in ONE Pallas streaming pass
    (ops/pallas_zbuf.py, 13.6 ns/candidate) instead of the XLA 3-op
    scatter/gather/scatter (28 ns coherent, 232 ns random); elsewhere the
    XLA fallback keeps identical semantics (candidate ids ARE active
    positions, so no translation is needed).  ``allow_pallas=False`` forces
    the XLA path — required under ``jax.vmap`` (BA's K-frame window), where
    Pallas cannot lower batched ANY-memory-space operands."""
    from .pallas_zbuf import zbuffer_argmin_auto

    factor = params.index_factor
    icam = cam.scaled(factor)
    H, W = icam.height, icam.width
    zkey, fpix = index_candidates(at, T_inv, time, cam, params)
    if not allow_pallas:
        aids = jnp.arange(at.size, dtype=jnp.int32)
        return index_resolve(zkey, fpix, aids, H * W).reshape(H, W)
    # valid slots are the table PREFIX (plan orders active blocks first), so
    # the kernel streams only the live candidates, not the budget padding
    n_valid = jnp.sum(at.slot_valid.astype(jnp.int32))
    _, idbuf = zbuffer_argmin_auto(zkey, fpix, H * W, n_valid=n_valid)
    return jnp.where(idbuf == INT32_MAX, -1, idbuf).reshape(H, W)


# ---------------------------------------------------------------------------
# Association + merge on the checkerboard lattice (flat)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AssocFlat:
    """Per-checkerboard-pixel fusion records, flat [(H*W)//2] leaves in
    column-major lattice order.  Same mark convention as ops/association.py:
    -10 invalid | -1 new unstable | >=0 ACTIVE slot to fuse into."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    conf: jax.Array
    colorsem: jax.Array
    init_t: jax.Array
    last_t: jax.Array
    nx: jax.Array
    ny: jax.Array
    nz: jax.Array
    radius: jax.Array
    mark: jax.Array


def _angle_between(ax, ay, az, bx, by, bz) -> jax.Array:
    """acos(a.b/(|a||b|)) exactly as data.vert:54-57 (component form)."""
    dot = ax * bx + ay * by + az * bz
    na = jnp.sqrt(ax * ax + ay * ay + az * az)
    nb = jnp.sqrt(bx * bx + by * by + bz * bz)
    cosv = dot / jnp.maximum(na * nb, 1e-12)
    return jnp.arccos(jnp.clip(cosv, -1.0, 1.0))


def associate_active(
    depth: jax.Array,
    rgb: jax.Array,
    semantic: jax.Array,
    index_image: jax.Array,
    at: ActiveTable,
    pose: jax.Array,
    T_inv: jax.Array,
    time: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    fuse_thresh: float | None = None,
) -> AssocFlat:
    """The data.vert association+merge kernel (ops/association.py math) on
    flat checkerboard pixels with 1D gathers from the active table.

    Reproduced quirks (see ops/association.py docstring for citations):
    index validity ``id`` valid iff slot maps to global id > 0 (enforced at
    the index scatter); merged color = new color (data.vert:183); merged
    radius = min(new, old) (data.vert:193).
    """
    p = params
    if fuse_thresh is None:
        fuse_thresh = p.fuse_thresh_factor
    factor = p.index_factor

    cand = association_candidates(depth, rgb, semantic, cam, p)
    xl_img, yl_img, lam_img = ray_geometry(cam)

    # flat checkerboard slices (column-major lattice order)
    cb = checkerboard_flat
    c_px, c_py, c_pz = cb(cand.px), cb(cand.py), cb(cand.pz)
    c_nx, c_ny, c_nz = cb(cand.nx), cb(cand.ny), cb(cand.nz)
    c_rad = cb(cand.radius)
    c_conf = cb(cand.conf)
    c_cs = cb(cand.colorsem)
    c_sem = cb(cand.sem)
    c_valid = cb(cand.valid)
    c_lam = cb(lam_img)
    c_rayx, c_rayy = cb(xl_img), cb(yl_img)  # ray z component == 1
    c_depth = cb(depth)

    # Packed attribute table for the per-pixel reads: ONE [Vp,16] row gather
    # replaces 9 separate 1-D gathers (measured on TPU: 5 ms vs 66 ms for
    # the same element count — row gathers cost per ROW).  Rows must be a
    # full 16 lanes: gathering a 9-wide slice falls off the fast path
    # (tools/probe_rowgather.py).
    packed = jnp.stack(
        (at.x, at.y, at.z, at.conf, at.colorsem,
         at.nx, at.ny, at.nz, at.radius),
        axis=1,
    )
    packed = jnp.pad(packed, ((0, 0), (0, 7)))  # full 16-lane rows

    best = None
    for wi in range(factor):
        for wj in range(factor):
            sub = index_image[wj::factor, wi::factor]
            mid = checkerboard_flat(sub)
            has = mid >= 0  # source already excluded global id 0
            safe = jnp.where(has, mid, 0)
            rows = packed[safe]  # [Vp, 16] single row gather
            ox = rows[:, 0]
            oy = rows[:, 1]
            oz = rows[:, 2]
            o_conf = rows[:, 3]
            o_cs = rows[:, 4]
            onx = rows[:, 5]
            ony = rows[:, 6]
            onz = rows[:, 7]
            o_rad = rows[:, 8]
            # camera-frame old vertex/normal (gather_fields equivalent)
            R, t = T_inv[:3, :3], T_inv[:3, 3]
            px = R[0, 0] * ox + R[0, 1] * oy + R[0, 2] * oz + t[0]
            py = R[1, 0] * ox + R[1, 1] * oy + R[1, 2] * oz + t[1]
            pz = R[2, 0] * ox + R[2, 1] * oy + R[2, 2] * oz + t[2]
            cnx = R[0, 0] * onx + R[0, 1] * ony + R[0, 2] * onz
            cny = R[1, 0] * onx + R[1, 1] * ony + R[1, 2] * onz
            cnz = R[2, 0] * onx + R[2, 1] * ony + R[2, 2] * onz
            nlen = jnp.maximum(jnp.sqrt(cnx * cnx + cny * cny + cnz * cnz), 1e-12)
            cnx, cny, cnz = cnx / nlen, cny / nlen, cnz / nlen

            o_sem = (jax.lax.bitcast_convert_type(o_cs, jnp.uint32) >> 24).astype(jnp.int32)
            depth_gate = jnp.abs(pz * c_lam - c_depth * c_lam) <= fuse_thresh
            sem_gate = c_sem == o_sem
            # perpendicular ray distance |ray x p| / lam (data.vert:150);
            # ray = (xl, yl, 1)
            crx = c_rayy * pz - 1.0 * py
            cry = 1.0 * px - c_rayx * pz
            crz = c_rayx * py - c_rayy * px
            dist = jnp.sqrt(crx * crx + cry * cry + crz * crz) / c_lam
            ang = _angle_between(cnx, cny, cnz, c_nx, c_ny, c_nz)
            ok = has & sem_gate & depth_gate & (jnp.abs(ang) < p.merge_normal_angle)
            dist = jnp.where(ok, dist, jnp.inf)
            entry = dict(
                dist=dist, id=mid, px=px, py=py, pz=pz, conf=o_conf,
                cs=o_cs, nx=cnx, ny=cny, nz=cnz, rad=o_rad,
            )
            if best is None:
                best = entry
            else:
                take = entry["dist"] < best["dist"]
                best = {k: jnp.where(take, entry[k], best[k]) for k in best}

    matched = c_valid & jnp.isfinite(best["dist"])

    # ---- merge math (data.vert:174-208, as in ops/association.py) --------
    c_n = c_conf
    c_o = best["conf"]
    csum = c_n + c_o
    merge_small = c_rad < p.merge_radius_factor * best["rad"]

    def avg(new, old):
        return (c_n * new + c_o * old) / csum

    mpx = jnp.where(merge_small, avg(c_px, best["px"]), best["px"])
    mpy = jnp.where(merge_small, avg(c_py, best["py"]), best["py"])
    mpz = jnp.where(merge_small, avg(c_pz, best["pz"]), best["pz"])
    mnx = jnp.where(merge_small, avg(c_nx, best["nx"]), best["nx"])
    mny = jnp.where(merge_small, avg(c_ny, best["ny"]), best["ny"])
    mnz = jnp.where(merge_small, avg(c_nz, best["nz"]), best["nz"])
    mrad = jnp.where(merge_small, jnp.minimum(c_rad, best["rad"]), best["rad"])
    # data.vert:183: merged color == new color; semantics equal by the gate.
    new_cs = c_cs
    mcs = jnp.where(merge_small, new_cs, best["cs"])

    # merged vs new-unstable records (camera frame)
    ox = jnp.where(matched, mpx, c_px)
    oy = jnp.where(matched, mpy, c_py)
    oz = jnp.where(matched, mpz, c_pz)
    nxx = jnp.where(matched, mnx, c_nx)
    nyy = jnp.where(matched, mny, c_ny)
    nzz = jnp.where(matched, mnz, c_nz)
    conf = jnp.where(matched, csum, c_n)
    radius = jnp.where(matched, mrad, c_rad)
    colorsem = jnp.where(matched, mcs, new_cs)
    init_t = jnp.where(matched, jnp.float32(0.0), time)  # merged init_t stays in place
    last_t = jnp.full_like(init_t, time)

    # world frame (transforms.py precision notes apply)
    Rw, tw = pose[:3, :3], pose[:3, 3]
    wx = Rw[0, 0] * ox + Rw[0, 1] * oy + Rw[0, 2] * oz + tw[0]
    wy = Rw[1, 0] * ox + Rw[1, 1] * oy + Rw[1, 2] * oz + tw[1]
    wz = Rw[2, 0] * ox + Rw[2, 1] * oy + Rw[2, 2] * oz + tw[2]
    wnx = Rw[0, 0] * nxx + Rw[0, 1] * nyy + Rw[0, 2] * nzz
    wny = Rw[1, 0] * nxx + Rw[1, 1] * nyy + Rw[1, 2] * nzz
    wnz = Rw[2, 0] * nxx + Rw[2, 1] * nyy + Rw[2, 2] * nzz
    wl = jnp.maximum(jnp.sqrt(wnx * wnx + wny * wny + wnz * wnz), 1e-12)
    wnx, wny, wnz = wnx / wl, wny / wl, wnz / wl

    mark = jnp.where(
        c_valid, jnp.where(matched, best["id"], -1), -10
    ).astype(jnp.int32)

    return AssocFlat(
        x=wx, y=wy, z=wz, conf=conf, colorsem=colorsem,
        init_t=init_t, last_t=last_t,
        nx=wnx, ny=wny, nz=wnz, radius=radius, mark=mark,
    )


def fuse_active(at: ActiveTable, assoc: AssocFlat) -> ActiveTable:
    """fuse.vert scatter (src/GlobalModel.cpp:348-394): write merged records
    over their target ACTIVE slots.  init_t is untouched (merges keep the old
    initTime — one less scatter + gather than round 1).  Duplicate marks
    resolve to an arbitrary winner exactly like the GL point-scatter race
    (ops/fusion.py:fuse_scatter note)."""
    write = assoc.mark >= 0
    idx = jnp.where(write, assoc.mark, at.size)

    def sc(dst, src):
        return dst.at[idx].set(src, mode="drop")

    return dataclasses.replace(
        at,
        x=sc(at.x, assoc.x),
        y=sc(at.y, assoc.y),
        z=sc(at.z, assoc.z),
        conf=sc(at.conf, assoc.conf),
        colorsem=sc(at.colorsem, assoc.colorsem),
        last_t=sc(at.last_t, assoc.last_t),
        nx=sc(at.nx, assoc.nx),
        ny=sc(at.ny, assoc.ny),
        nz=sc(at.nz, assoc.nz),
        radius=sc(at.radius, assoc.radius),
    )


def fuse_append_map(
    smap: SurfelMap,
    at: ActiveTable,
    assoc: AssocFlat,
    block_size: int,
) -> tuple[SurfelMap, jax.Array]:
    """Fused tail of the frame: block writeback (conflict tombstones) + ONE
    combined scatter applying both the merge writes (fuse.vert semantics,
    records with mark >= 0 land on their GLOBAL map slot) and the tail
    append (unstable.vert + concatenate, mark == -1 records pack after
    count in lattice order).

    Replaces fuse_active(table) -> writeback_active -> append_flat: the
    merged records previously took a 10-column scatter into the table AND
    rode the block writeback, and the appends paid an 11-column staging
    scatter — this path scatters each assoc column exactly once (~10 x Vp
    fewer scattered elements per frame).

    init_t is scattered separately for new records only (merges keep the old
    initTime, data.vert:186).  Appends stay all-or-nothing on overflow
    (n_dropped returned; pre-growth makes it unreachable in the pipeline).
    """
    smap = writeback_active(smap, at, block_size)
    cap = smap.capacity
    matched = assoc.mark >= 0
    is_new = assoc.mark == -1
    Vp = is_new.shape[0]
    offs = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_new = jnp.maximum(offs[-1] + 1, 0)
    fits = smap.count + n_new <= cap

    safe_mark = jnp.where(matched, assoc.mark, 0)
    dest_merge = at.global_id[safe_mark]
    dest_new = smap.count + offs
    new_ok = is_new & fits
    dest = jnp.where(
        matched, dest_merge, jnp.where(new_ok, dest_new, cap)
    )
    # tombstoned merge targets keep their write (the reference's fuse
    # scatter also writes rows whose conflict decrement landed this frame —
    # the conf it writes is the pre-conflict sum, same as fuse_active's)
    cols = dict(
        px=assoc.x, py=assoc.y, pz=assoc.z,
        conf=assoc.conf, colorsem=assoc.colorsem,
        last_t=assoc.last_t,
        nx=assoc.nx, ny=assoc.ny, nz=assoc.nz, radius=assoc.radius,
    )
    appended = jnp.where(fits, n_new, 0)
    new_map = dataclasses.replace(
        smap,
        count=smap.count + appended,
        init_t=smap.init_t.at[jnp.where(new_ok, dest_new, cap)].set(
            assoc.init_t, mode="drop"
        ),
        **{
            k: getattr(smap, k).at[dest].set(v, mode="drop")
            for k, v in cols.items()
        },
    )
    return new_map, n_new - appended


def table_from_map(smap: SurfelMap) -> ActiveTable:
    """View a (shard-local) planar map directly as an ActiveTable whose
    active positions ARE the map slots — used by the sharded step, where each
    device's slot range is already its working set and associate/fuse can
    address it without a block gather."""
    ids = jnp.arange(smap.capacity, dtype=jnp.int32)
    return ActiveTable(
        x=smap.px, y=smap.py, z=smap.pz,
        conf=smap.conf, colorsem=smap.colorsem,
        init_t=smap.init_t, last_t=smap.last_t,
        nx=smap.nx, ny=smap.ny, nz=smap.nz,
        radius=smap.radius,
        global_id=ids,
        slot_valid=ids < smap.count,
        blk=jnp.zeros((0,), jnp.int32),
    )


def map_from_table(at: ActiveTable, count: jax.Array) -> SurfelMap:
    """Inverse of :func:`table_from_map` (same slot addressing)."""
    return SurfelMap(
        px=at.x, py=at.y, pz=at.z,
        conf=at.conf, colorsem=at.colorsem,
        init_t=at.init_t, last_t=at.last_t,
        nx=at.nx, ny=at.ny, nz=at.nz,
        radius=at.radius,
        count=count,
    )


def append_round_robin(
    smap: SurfelMap, assoc: AssocFlat, rank_mod: int, my_rank: jax.Array
) -> tuple[SurfelMap, jax.Array]:
    """Shard-local variant of :func:`append_flat`: append only the new
    records whose lattice rank r satisfies r % rank_mod == my_rank, packed at
    the local tail.  Round-robin dealing keeps shards balanced and makes the
    global surfel SET identical to the single-chip append (order interleaved
    deterministically).  Returns (map, n_dropped_local)."""
    is_new = assoc.mark == -1
    Vp = is_new.shape[0]
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    to_me = is_new & (rank % rank_mod == my_rank)
    dest = smap.count + jnp.where(to_me, rank // rank_mod, Vp)
    ok = to_me & (dest < smap.capacity)
    idx = jnp.where(ok, dest, smap.capacity)
    cols = dict(
        px=assoc.x, py=assoc.y, pz=assoc.z,
        conf=assoc.conf, colorsem=assoc.colorsem,
        init_t=assoc.init_t, last_t=assoc.last_t,
        nx=assoc.nx, ny=assoc.ny, nz=assoc.nz, radius=assoc.radius,
    )
    n_mine = jnp.sum(to_me.astype(jnp.int32))
    appended = jnp.minimum(n_mine, jnp.maximum(smap.capacity - smap.count, 0))
    new_map = dataclasses.replace(
        smap,
        count=smap.count + appended,
        **{
            k: getattr(smap, k).at[idx].set(v, mode="drop")
            for k, v in cols.items()
        },
    )
    return new_map, n_mine - appended


def fuse_append_shard(
    local: SurfelMap,
    at: ActiveTable,
    assoc: AssocFlat,
    block_size: int,
    rank_mod: int,
    my_rank: jax.Array,
) -> tuple[SurfelMap, jax.Array]:
    """Sharded variant of :func:`fuse_append_map`: block writeback + ONE
    combined scatter of merge writes (at.global_id is the LOCAL slot here)
    and this shard's round-robin share of the new records (same dealing as
    append_round_robin, so the global surfel SET matches single-chip)."""
    local = writeback_active(local, at, block_size)
    cap = local.capacity
    matched = assoc.mark >= 0
    is_new = assoc.mark == -1
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    to_me = is_new & (rank % rank_mod == my_rank)
    dest_new = local.count + rank // rank_mod
    ok_new = to_me & (dest_new < cap)

    safe_mark = jnp.where(matched, assoc.mark, 0)
    dest_merge = at.global_id[safe_mark]
    dest = jnp.where(matched, dest_merge, jnp.where(ok_new, dest_new, cap))
    cols = dict(
        px=assoc.x, py=assoc.y, pz=assoc.z,
        conf=assoc.conf, colorsem=assoc.colorsem,
        last_t=assoc.last_t,
        nx=assoc.nx, ny=assoc.ny, nz=assoc.nz, radius=assoc.radius,
    )
    n_mine = jnp.sum(to_me.astype(jnp.int32))
    appended = jnp.minimum(n_mine, jnp.maximum(cap - local.count, 0))
    new_map = dataclasses.replace(
        local,
        count=local.count + appended,
        init_t=local.init_t.at[jnp.where(ok_new, dest_new, cap)].set(
            assoc.init_t, mode="drop"
        ),
        **{
            k: getattr(local, k).at[dest].set(v, mode="drop")
            for k, v in cols.items()
        },
    )
    return new_map, n_mine - appended


def append_flat(smap: SurfelMap, assoc: AssocFlat) -> tuple[SurfelMap, jax.Array]:
    """Append mark==-1 records at the map tail (unstable.vert/.geom +
    concatenate, src/GlobalModel.cpp:581-637).  assoc is already in
    column-major lattice order, so ids match the reference lattice exactly
    (ops/fusion.py:append_new parity).  Returns (map, n_dropped).

    Fast path (capacity >= lattice size): the tail write is a small-target
    scatter into a [Vp] staging buffer + one contiguous dynamic-update-slice
    — full-capacity-target scatters measured ~5x slower.  Appends are
    all-or-nothing: on overflow nothing is written and n_dropped = n_new
    (the host grows the buffer and replays; pre-growth makes this unreachable
    in the steady pipeline)."""
    is_new = assoc.mark == -1
    Vp = is_new.shape[0]
    offs = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_new = jnp.maximum(offs[-1] + 1, 0)
    cols = dict(
        px=assoc.x, py=assoc.y, pz=assoc.z,
        conf=assoc.conf, colorsem=assoc.colorsem,
        init_t=assoc.init_t, last_t=assoc.last_t,
        nx=assoc.nx, ny=assoc.ny, nz=assoc.nz, radius=assoc.radius,
    )

    if smap.capacity >= Vp:
        fits = smap.count + Vp <= smap.capacity
        start = jnp.clip(smap.count, 0, smap.capacity - Vp)
        sidx = jnp.where(is_new, offs, Vp)  # small-target staging scatter
        lattice = jnp.arange(Vp, dtype=jnp.int32)
        keep_new = (lattice < n_new) & fits

        def app(dst, src):
            stage = jnp.zeros((Vp,), src.dtype).at[sidx].set(src, mode="drop")
            window = jax.lax.dynamic_slice_in_dim(dst, start, Vp, axis=0)
            merged = jnp.where(keep_new, stage, window)
            return jax.lax.dynamic_update_slice_in_dim(dst, merged, start, axis=0)

        appended = jnp.where(fits, n_new, 0)
        new_map = dataclasses.replace(
            smap,
            count=smap.count + appended,
            **{k: app(getattr(smap, k), v) for k, v in cols.items()},
        )
        return new_map, n_new - appended

    # small-capacity fallback: direct (partial) scatter into the tail
    dest = smap.count + offs
    ok = is_new & (dest < smap.capacity)
    idx = jnp.where(ok, dest, smap.capacity)

    def app1(dst, src):
        return dst.at[idx].set(src, mode="drop")

    appended = jnp.minimum(n_new, jnp.maximum(smap.capacity - smap.count, 0))
    new_map = dataclasses.replace(
        smap,
        count=smap.count + appended,
        **{k: app1(getattr(smap, k), v) for k, v in cols.items()},
    )
    return new_map, n_new - appended
