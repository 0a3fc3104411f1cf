"""Find the property of mapper state that makes compact slow (dev tool)."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from surfelmapping_tpu.config import MapConfig, PipelineParams
from surfelmapping_tpu.io.synthetic import SyntheticScene, kitti_cam
from surfelmapping_tpu.pipeline import SurfelMapper
from surfelmapping_tpu.ops.fusion import compact


def t(name, fn, *args, n=3):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)


cam = kitti_cam()
mapper = SurfelMapper(cam, PipelineParams(), MapConfig(capacity=1 << 22))
scene = SyntheticScene(cam, step=0.8)
for i in range(6):
    rgb, d, s, T = scene.frame(i)
    mapper.process_frame(rgb, d, s, T)
jax.block_until_ready(mapper.smap.pos)
smap = mapper.smap
print("dtypes:", {f.name: getattr(smap, f.name).dtype for f in dataclasses.fields(smap) if hasattr(getattr(smap, f.name), 'dtype')})
print("count type:", type(smap.count), getattr(smap.count, 'dtype', None))

t("compact (mapper smap)", compact, smap)

# roundtrip through host: fresh buffers, same values
fresh = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), smap)
t("compact (host-roundtrip copy)", compact, fresh)

# device-side copy
dev = jax.tree.map(lambda a: a + 0 if hasattr(a, "dtype") else a, smap)
jax.block_until_ready(dev.pos)
t("compact (device copy)", compact, dev)
