"""Measure the production Pallas z-buffer kernel (ops/pallas_zbuf.py) vs the
XLA 3-op index_resolve path on the real TPU, at index-map production sizes.

Orders probed:
  random — worst case (renderer at adversarial views);
  sorted — fully coherent (upper bound for block-ordered fusion candidates);
  walk   — random walk over pixels (realistic spatial coherence proxy).

Run: python tools/probe_zbuf_production.py [--a 1048576] [--p 453620]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from surfelmapping_tpu.ops.active import index_resolve
from surfelmapping_tpu.ops.index_map import INT32_MAX
from surfelmapping_tpu.ops.pallas_zbuf import zbuffer_argmin


def xla_3op(zkey, fpix, ids, P):
    zbuf = jnp.full((P,), INT32_MAX, jnp.int32).at[fpix].min(zkey, mode="drop")
    idb = index_resolve(zkey, fpix, ids, P, depth_buf=zbuf,
                        empty_to_minus1=False)
    return zbuf, idb


def bench(fn, zkey, fpix, iters=6):
    z, i = fn(zkey, fpix)
    _ = int(z[0])  # force
    t0 = time.perf_counter()
    c = jnp.int32(0)
    for _ in range(iters):
        z, i = fn(zkey + (c & 0), fpix)
        c = z[0]
    _ = int(c)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", type=int, default=1 << 20)
    ap.add_argument("--p", type=int, default=453_620)
    args = ap.parse_args()
    A, P = args.a, args.p
    rng = np.random.default_rng(0)
    zkey = jnp.asarray(rng.integers(0, 1 << 30, A).astype(np.int32))
    ids = jnp.arange(A, dtype=jnp.int32)

    frand = rng.integers(0, P, A).astype(np.int32)
    orders = {
        "random": frand,
        "sorted": np.sort(frand),
        "walk": np.clip(
            np.cumsum(rng.integers(-40, 42, A)) % P, 0, P - 1
        ).astype(np.int32),
    }

    jx = jax.jit(lambda z, f: xla_3op(z, f, ids, P))
    for name, fp in orders.items():
        fpix = jnp.asarray(fp)
        t = bench(jx, zkey, fpix)
        print(f"xla 3-op   {name:7s} {t:8.2f} ms  ({t*1e6/A:5.1f} ns/cand)",
              flush=True)
        for R in (1, 2, 4):
            jp = jax.jit(
                lambda z, f, R=R: zbuffer_argmin(z, f, P, replicas=R)
            )
            try:
                t = bench(jp, zkey, fpix)
                print(f"pallas R={R} {name:7s} {t:8.2f} ms  "
                      f"({t*1e6/A:5.1f} ns/cand)", flush=True)
            except Exception as e:  # VMEM overflow etc.
                print(f"pallas R={R} {name:7s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
