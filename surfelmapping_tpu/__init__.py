"""surfelmapping_tpu: a TPU-native dense surfel mapping engine.

Brand-new JAX/XLA/Pallas implementation of the capability set of
SUSTech-SLAM-XYZZY/SurfelMapping (see SURVEY.md): KITTI-style RGB + stereo
depth + semantic frames in, an incrementally fused global surfel map out,
with novel-view splat rendering for simulator data generation, frame-to-model
ICP pose refinement, and a block-sharded map that scales across TPU meshes.
"""

import os as _os

import jax as _jax

# Honor JAX_PLATFORMS=cpu even when a hardware plugin ignores it (the dev
# environment's TPU plugin claims the backend regardless of the env var).
# Only the "cpu" escape hatch is forced — hardware platform names are plugin
# aliases jax must resolve itself.  Must run before backend initialization;
# a no-op if a backend is already live (tests force CPU via their conftest).
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    try:
        _jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

from .config import CameraIntrinsics, MapConfig, PipelineParams
from .pipeline import SurfelMapper
from .surfels import SurfelMap, empty_map, load_map, save_map

__all__ = [
    "CameraIntrinsics",
    "MapConfig",
    "PipelineParams",
    "SurfelMap",
    "SurfelMapper",
    "empty_map",
    "load_map",
    "save_map",
]

__version__ = "0.1.0"
