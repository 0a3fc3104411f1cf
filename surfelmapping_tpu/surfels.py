"""The HBM-resident surfel map: a fixed-capacity struct-of-arrays pytree.

TPU-native replacement for the reference's interleaved 48-byte-per-surfel
GL vertex buffer + triple "model map" texture mirror (src/GlobalModel.cpp:27-63,
src/Config.cpp:16-31).  On TPU the scatter/gather passes address the surfel
arrays directly, so the VBO/texture duality disappears: there is exactly one
copy of the map, laid out as separate arrays per attribute (best layout for
the VPU's (8,128) tiles and for XLA scatter/gather).

Capacity is static under jit; the live prefix length is the traced scalar
``count`` (the "transform feedback written-count" of the reference,
src/GlobalModel.cpp:319-325, without the device->host readback).

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
    """Struct-of-arrays surfel storage.

    Attributes (capacity N slots, live prefix ``count``):
      pos:     f32[N,3] world position
      conf:    f32[N]   confidence (vec4#0.w of the reference record)
      rgb:     f32[N,3] color in [0,1] (8-bit lattice, see ops/colors.py)
      sem:     i32[N]   semantic class id
      init_t:  f32[N]   first-seen tick (vec4#1.z)
      last_t:  f32[N]   last-fused tick (vec4#1.w)
      normal:  f32[N,3] world unit normal
      radius:  f32[N]   surfel disc radius (m)
      count:   i32[]    number of live surfels in the prefix [0, count)
    """

    pos: jax.Array
    conf: jax.Array
    rgb: jax.Array
    sem: jax.Array
    init_t: jax.Array
    last_t: jax.Array
    normal: jax.Array
    radius: jax.Array
    count: jax.Array

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    def live_mask(self) -> jax.Array:
        """Boolean mask over slots: True for the live prefix."""
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.count


def empty_map(capacity: int) -> SurfelMap:
    """Allocate an all-zero map with the given slot capacity."""
    f = jnp.zeros
    return SurfelMap(
        pos=f((capacity, 3), jnp.float32),
        conf=f((capacity,), jnp.float32),
        rgb=f((capacity, 3), jnp.float32),
        sem=f((capacity,), jnp.int32),
        init_t=f((capacity,), jnp.float32),
        last_t=f((capacity,), jnp.float32),
        normal=f((capacity, 3), jnp.float32),
        radius=f((capacity,), jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def resize_map(m: SurfelMap, new_capacity: int) -> SurfelMap:
    """Copy a map into a larger (or equal) allocation; host-side bucket
    growth for the jit cache (see config.MapConfig)."""
    if new_capacity < int(m.count):
        raise ValueError("cannot shrink below live count")
    out = empty_map(new_capacity)
    n = min(m.capacity, new_capacity)

    def cp(dst, src):
        return dst.at[:n].set(src[:n])

    return SurfelMap(
        pos=cp(out.pos, m.pos),
        conf=cp(out.conf, m.conf),
        rgb=cp(out.rgb, m.rgb),
        sem=cp(out.sem, m.sem),
        init_t=cp(out.init_t, m.init_t),
        last_t=cp(out.last_t, m.last_t),
        normal=cp(out.normal, m.normal),
        radius=cp(out.radius, m.radius),
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
    packed_color = encode_color(m.rgb, m.sem.astype(jnp.uint32))
    rec = jnp.concatenate(
        [
            m.pos,
            m.conf[:, None],
            packed_color[:, None],
            jnp.zeros((m.capacity, 1), jnp.float32),
            m.init_t[:, None],
            m.last_t[:, None],
            m.normal,
            m.radius[:, None],
        ],
        axis=1,
    )
    return rec * live[:, None]


def unpack_records(rec: jax.Array, count: jax.Array | int) -> SurfelMap:
    """Inverse of :func:`pack_records` (ref record layout -> SoA map)."""
    rgb, sem = decode_color(rec[:, 4])
    return SurfelMap(
        pos=rec[:, 0:3],
        conf=rec[:, 3],
        rgb=rgb,
        sem=sem.astype(jnp.int32),
        init_t=rec[:, 6],
        last_t=rec[:, 7],
        normal=rec[:, 8:11],
        radius=rec[:, 11],
        count=jnp.asarray(count, jnp.int32),
    )


def save_map(m: SurfelMap, path: str, start_id: int, end_id: int) -> None:
    """Write the reference's binary map format
    [u32 count][i32 start][i32 end][count*12 f32]
    (src/GlobalModel.cpp:901-953); little-endian, same as x86 host writes."""
    count = int(m.count)
    rec = np.asarray(jax.device_get(pack_records(m)))[:count]
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
