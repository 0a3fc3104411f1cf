"""The HBM-resident surfel map: a fixed-capacity, fully-planar SoA pytree.

TPU-native replacement for the reference's interleaved 48-byte-per-surfel
GL vertex buffer + triple "model map" texture mirror (src/GlobalModel.cpp:27-63,
src/Config.cpp:16-31).  On TPU the scatter/gather passes address the surfel
arrays directly, so the VBO/texture duality disappears: there is exactly one
copy of the map, laid out as SEPARATE 1D arrays per scalar attribute.

The planar layout is load-bearing on TPU, not a style choice:
  * XLA tiles the last two dims of every array to (8 sublanes, 128 lanes);
    an f32[N,3] position array pads 3 -> 128 lanes = 42.7x the memory (a 25M
    surfel map would need >12 GB for positions alone) and 42.7x the HBM
    traffic of every pass that touches it;
  * gathers/scatters on 1D arrays hit XLA's fast per-element path (~5-10 ns/
    element measured); the same op on a 2D row layout costs ~100 ns/row
    regardless of width.
Color and semantics live bit-packed in ONE float (``colorsem``, color.glsl's
sem<<24|r<<16|g<<8|b layout) — the association/fuse crossings move 1 value
instead of 4, and the checkpoint writes the column verbatim.

Capacity is static under jit; the live prefix length is the traced scalar
``count`` (the "transform feedback written-count" of the reference,
src/GlobalModel.cpp:319-325, without the device->host readback).  Slots in
the prefix with conf <= 0 are tombstones awaiting deferred compaction
(ops/active.py); every consumer gates on conf > 0.

The checkpoint format is byte-compatible with the reference's
``downloadMap``/``uploadMap``: [u32 count][i32 start_id][i32 end_id]
[count x 12 f32] with the 12-float record layout documented in
src/Config.cpp:16-31 (src/GlobalModel.cpp:901-1011).
"""

from __future__ import annotations

import dataclasses
from typing import BinaryIO

import jax
import jax.numpy as jnp
import numpy as np

from .ops.colors import decode_color, encode_color


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SurfelMap:
    """Planar struct-of-arrays surfel storage (capacity N, live prefix
    ``count``; all attribute leaves are f32[N] except noted).

      px, py, pz: world position
      conf:       confidence (vec4#0.w of the reference record)
      colorsem:   packed (sem<<24 | r<<16 | g<<8 | b) bits in an f32
      init_t:     first-seen tick (vec4#1.z)
      last_t:     last-fused tick (vec4#1.w)
      nx, ny, nz: world unit normal
      radius:     surfel disc radius (m)
      count:      i32[] live-prefix length
    """

    px: jax.Array
    py: jax.Array
    pz: jax.Array
    conf: jax.Array
    colorsem: jax.Array
    init_t: jax.Array
    last_t: jax.Array
    nx: jax.Array
    ny: jax.Array
    nz: jax.Array
    radius: jax.Array
    count: jax.Array

    @property
    def capacity(self) -> int:
        return self.px.shape[0]

    def live_mask(self) -> jax.Array:
        """Boolean mask over slots: True for the live prefix."""
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.count

    # -- stacked views (cold paths only: each materializes an (N,3) temp
    #    that XLA pads 42.7x — never put these inside per-frame loops) ------

    def pos(self) -> jax.Array:
        return jnp.stack([self.px, self.py, self.pz], axis=-1)

    def normal(self) -> jax.Array:
        return jnp.stack([self.nx, self.ny, self.nz], axis=-1)

    def rgb(self) -> jax.Array:
        return decode_color(self.colorsem)[0]

    def sem(self) -> jax.Array:
        return decode_color(self.colorsem)[1].astype(jnp.int32)


def map_from_stacked(
    pos, conf, rgb, sem, init_t, last_t, normal, radius, count
) -> SurfelMap:
    """Build a planar map from stacked (N,3) pos/rgb/normal arrays."""
    return SurfelMap(
        px=pos[:, 0], py=pos[:, 1], pz=pos[:, 2],
        conf=conf,
        colorsem=encode_color(rgb, jnp.asarray(sem).astype(jnp.uint32)),
        init_t=init_t, last_t=last_t,
        nx=normal[:, 0], ny=normal[:, 1], nz=normal[:, 2],
        radius=radius,
        count=jnp.asarray(count, jnp.int32),
    )


def empty_map(capacity: int) -> SurfelMap:
    """Allocate an all-zero map with the given slot capacity.

    Each column gets its OWN buffer: the fusion step donates the map, and
    donation rejects the same buffer appearing under two arguments (a shared
    zeros vector would)."""

    def z():
        return jnp.zeros((capacity,), jnp.float32)

    return SurfelMap(
        px=z(), py=z(), pz=z(), conf=z(), colorsem=z(), init_t=z(),
        last_t=z(), nx=z(), ny=z(), nz=z(), radius=z(),
        count=jnp.zeros((), jnp.int32),
    )


def resize_map(m: SurfelMap, new_capacity: int) -> SurfelMap:
    """Copy a map into a larger (or equal) allocation; host-side bucket
    growth for the jit cache (see config.MapConfig)."""
    if new_capacity < int(m.count):
        raise ValueError("cannot shrink below live count")
    n = min(m.capacity, new_capacity)

    def cp(src):
        return jnp.zeros((new_capacity,), src.dtype).at[:n].set(src[:n])

    return SurfelMap(
        px=cp(m.px), py=cp(m.py), pz=cp(m.pz),
        conf=cp(m.conf), colorsem=cp(m.colorsem),
        init_t=cp(m.init_t), last_t=cp(m.last_t),
        nx=cp(m.nx), ny=cp(m.ny), nz=cp(m.nz),
        radius=cp(m.radius),
        count=m.count,
    )


# ---------------------------------------------------------------------------
# Reference-layout (12 f32 / surfel) packing, checkpoint IO
# ---------------------------------------------------------------------------

def pack_records(m: SurfelMap) -> jax.Array:
    """Pack the live prefix into the reference's 12-float record layout
    (src/Config.cpp:16-31): rows are
    [x y z conf | packedColor mark initT lastT | nx ny nz radius].

    ``mark`` is written as 0 — the persisted value after the reference's
    back-mapping reset (src/Shaders/back_map.geom:17-23).
    Returns f32[capacity, 12]; rows >= count are zero.
    """
    live = m.live_mask().astype(jnp.float32)
    zero = jnp.zeros_like(m.px)
    rec = jnp.stack(
        [
            m.px, m.py, m.pz, m.conf,
            m.colorsem, zero, m.init_t, m.last_t,
            m.nx, m.ny, m.nz, m.radius,
        ],
        axis=1,
    )
    return rec * live[:, None]


def unpack_records(rec: jax.Array, count: jax.Array | int) -> SurfelMap:
    """Inverse of :func:`pack_records` (ref record layout -> planar map)."""
    return SurfelMap(
        px=rec[:, 0], py=rec[:, 1], pz=rec[:, 2],
        conf=rec[:, 3],
        colorsem=rec[:, 4],
        init_t=rec[:, 6], last_t=rec[:, 7],
        nx=rec[:, 8], ny=rec[:, 9], nz=rec[:, 10],
        radius=rec[:, 11],
        count=jnp.asarray(count, jnp.int32),
    )


def save_map(m: SurfelMap, path: str, start_id: int, end_id: int) -> None:
    """Write the reference's binary map format
    [u32 count][i32 start][i32 end][count*12 f32]
    (src/GlobalModel.cpp:901-953); little-endian, same as x86 host writes.

    Tombstoned rows (conf <= 0, deferred removal — see ops/active.py) are
    filtered out host-side: the reference's downloadMap only ever contains
    live surfels because it compacted every frame, and relative order is
    preserved either way."""
    count = int(m.count)
    rec = np.asarray(jax.device_get(pack_records(m)))[:count]
    rec = rec[rec[:, 3] > 0.0]
    with open(path, "wb") as f:
        _write_map_stream(f, rec, start_id, end_id)


def _write_map_stream(f: BinaryIO, rec: np.ndarray, start_id: int, end_id: int) -> None:
    f.write(np.uint32(rec.shape[0]).tobytes())
    f.write(np.int32(start_id).tobytes())
    f.write(np.int32(end_id).tobytes())
    f.write(np.ascontiguousarray(rec, dtype="<f4").tobytes())


def load_map(path: str, capacity: int | None = None) -> tuple[SurfelMap, int, int]:
    """Read a reference-format map file; returns (map, start_id, end_id)
    (src/GlobalModel.cpp:955-1011, load_map.cpp:338-358)."""
    with open(path, "rb") as f:
        count = int(np.frombuffer(f.read(4), dtype="<u4")[0])
        start_id = int(np.frombuffer(f.read(4), dtype="<i4")[0])
        end_id = int(np.frombuffer(f.read(4), dtype="<i4")[0])
        rec = np.frombuffer(f.read(count * 48), dtype="<f4").reshape(count, 12)
    cap = capacity or max(1, count)
    if cap < count:
        raise ValueError(f"capacity {cap} < stored surfel count {count}")
    full = np.zeros((cap, 12), np.float32)
    full[:count] = rec
    return unpack_records(jnp.asarray(full), count), start_id, end_id
