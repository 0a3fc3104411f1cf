"""Color/semantic bit-packing and the 19-class palette.

The reference packs (semantic << 24 | r << 16 | g << 8 | b) into the bit
pattern of one float (src/Shaders/color.glsl:19-37); the in-memory TPU map
keeps color and semantics as separate arrays (scatter/gather friendly) and
packs only at the checkpoint boundary so map files remain byte-compatible
with the reference's ``downloadMap`` format (src/GlobalModel.cpp:901-953).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def encode_color(rgb: jax.Array, semantic: jax.Array) -> jax.Array:
    """Pack [..., 3] float rgb in [0,1] + [...] uint semantic into a float32
    whose *bits* are (sem << 24 | r << 16 | g << 8 | b).

    Matches src/Shaders/color.glsl:19-26 including the round-to-nearest
    quantization of each channel.
    """
    q = jnp.round(jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint32)
    packed = (
        (semantic.astype(jnp.uint32) << 24)
        | (q[..., 0] << 16)
        | (q[..., 1] << 8)
        | q[..., 2]
    )
    return jax.lax.bitcast_convert_type(packed, jnp.float32)


def decode_color(packed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inverse of :func:`encode_color`: returns (rgb float [...,3] in [0,1],
    semantic uint32 [...]).  Matches src/Shaders/color.glsl:28-37."""
    bits = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    sem = (bits >> 24) & 0xFF
    r = (bits >> 16) & 0xFF
    g = (bits >> 8) & 0xFF
    b = bits & 0xFF
    rgb = jnp.stack([r, g, b], axis=-1).astype(jnp.float32) / 255.0
    return rgb, sem


# Cityscapes-style 19-class train-id palette used by the reference's
# semantic-colored surfel rendering (src/GlobalModel.cpp:718-736) and GUI
# semantic display (src/Shaders/show_semantic.frag).
SEMANTIC_PALETTE = np.array(
    [
        [128, 64, 128],   # 0  road
        [244, 35, 232],   # 1  sidewalk
        [70, 70, 70],     # 2  building
        [102, 102, 156],  # 3  wall
        [190, 153, 153],  # 4  fence
        [153, 153, 153],  # 5  pole
        [250, 170, 30],   # 6  traffic light
        [220, 220, 0],    # 7  traffic sign
        [107, 142, 35],   # 8  vegetation
        [152, 251, 152],  # 9  terrain
        [70, 130, 180],   # 10 sky
        [220, 20, 60],    # 11 person
        [255, 0, 0],      # 12 rider
        [0, 0, 142],      # 13 car
        [0, 0, 70],       # 14 truck
        [0, 60, 100],     # 15 bus
        [0, 80, 100],     # 16 train
        [0, 0, 230],      # 17 motorcycle
        [119, 11, 32],    # 18 bicycle
    ],
    dtype=np.uint8,
)


def semantic_to_rgb(semantic: jax.Array) -> jax.Array:
    """Map class ids to palette colors for visualization (uint8 [...,3])."""
    palette = jnp.asarray(SEMANTIC_PALETTE)
    idx = jnp.clip(semantic.astype(jnp.int32), 0, palette.shape[0] - 1)
    return palette[idx]
