"""Bisect why compact() is 900ms when its primitives are 0.3ms (dev tool)."""
import time
import jax
import jax.numpy as jnp

from surfelmapping_tpu.surfels import SurfelMap, empty_map
from surfelmapping_tpu.ops.fusion import compact

N = 1 << 22
key = jax.random.PRNGKey(0)


def mk_map():
    m = empty_map(N)
    import dataclasses
    return dataclasses.replace(
        m,
        pos=jax.random.uniform(key, (N, 3)),
        conf=jax.random.uniform(key, (N,)),
        count=jnp.int32(1200000),
    )


def t(name, fn, *args, n=3):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms")


smap = mk_map()
t("compact (full)", compact, smap)


def compact_nocount(smap):
    keep = smap.live_mask() & (smap.conf > 0.0)
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    idx = jnp.where(keep, dest, smap.capacity)
    return jnp.zeros_like(smap.pos).at[idx].set(smap.pos, mode="drop")


t("compact pos-only", compact_nocount, smap)


def livemask_only(smap):
    return smap.live_mask() & (smap.conf > 0.0)


t("live_mask+conf", livemask_only, smap)


def cumsum_only(smap):
    keep = smap.live_mask() & (smap.conf > 0.0)
    return jnp.cumsum(keep.astype(jnp.int32))


t("mask+cumsum", cumsum_only, smap)

# the new_count scalar: dest[-1] read
def withcount(smap):
    keep = smap.live_mask() & (smap.conf > 0.0)
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    new_count = jnp.maximum(dest[-1] + 1, 0).astype(jnp.int32)
    idx = jnp.where(keep, dest, smap.capacity)
    out = jnp.zeros_like(smap.pos).at[idx].set(smap.pos, mode="drop")
    return out, new_count


t("pos-only + count", withcount, smap)

# gather variant instead of scatter (compaction as gather by rank)
def compact_gather(smap):
    keep = smap.live_mask() & (smap.conf > 0.0)
    order = jnp.argsort(~keep, stable=True)  # keepers first, order preserved
    return smap.pos[order]


t("compact via argsort+gather pos-only", compact_gather, smap)
