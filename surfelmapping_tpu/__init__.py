"""surfelmapping_tpu: a TPU-native dense surfel mapping engine.

Brand-new JAX/XLA/Pallas implementation of the capability set of
SUSTech-SLAM-XYZZY/SurfelMapping (see SURVEY.md): KITTI-style RGB + stereo
depth + semantic frames in, an incrementally fused global surfel map out,
with novel-view splat rendering for simulator data generation, frame-to-model
ICP pose refinement, and a block-sharded map that scales across TPU meshes.
"""

import os as _os

import jax as _jax

# Honor JAX_PLATFORMS even when a hardware plugin ignores it (the dev
# environment's TPU plugin claims the backend regardless of the env var).
# Must run before any backend initialization; a no-op if the backend is
# already live (tests force CPU through their own conftest).
_plat = _os.environ.get("JAX_PLATFORMS", "")
if _plat:
    try:
        _jax.config.update("jax_platforms", _plat)
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
