"""Prototype: Pallas scalar-loop scatter-argmin z-buffer vs XLA's two-pass
scatter-min (the index map / renderer hot op).

The kernel keeps the whole z-buffer + id-buffer in VMEM (1.8 MB each at
KITTI resolution), streams candidates through SMEM chunks (Mosaic has no
scalar VMEM access at unaligned dynamic lanes) and resolves depth AND
winner id in ONE pass with a masked 128-lane row RMW per candidate.

MEASURED (TPU v5e, 1M candidates, P=453k):
  * random pixel order:  pallas 22.2 ms  vs  XLA 2-pass 233.7 ms  (10x)
  * the production index stage's candidates arrive in BLOCK order
    (spatially coherent appends), where XLA's scatter costs only ~26 ms —
    the kernel is ~break-even there, so it is NOT integrated.  It becomes
    the right tool if candidate order ever degrades (e.g. hash-sharded
    maps) or for the renderer at adversarial orderings.

Run on TPU: python tools/probe_pallas_zbuf.py [--a 1048576]
Correctness: python tools/probe_pallas_zbuf.py --interpret-check (CPU)
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MAX = np.int32(2**31 - 1)


def make_kernel(A: int, P_pad: int):
    ROWS = P_pad // 128

    CHUNK = 2048

    def kernel(zkey_hbm, fpix_hbm, zbuf_ref, idbuf_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)[0]
        zbuf_ref[:] = jnp.full((ROWS, 128), INT32_MAX, jnp.int32)
        idbuf_ref[:] = jnp.full((ROWS, 128), INT32_MAX, jnp.int32)

        def scoped(zc, fc, sem):
            nchunks = A // CHUNK

            def outer(ci, _):
                # stream candidates into SMEM (scalar loads need SMEM —
                # Mosaic has neither scalar VMEM loads nor stores at
                # unaligned dynamic lanes)
                czk = pltpu.make_async_copy(
                    zkey_hbm.at[pl.ds(ci * CHUNK, CHUNK)], zc, sem.at[0]
                )
                cfp = pltpu.make_async_copy(
                    fpix_hbm.at[pl.ds(ci * CHUNK, CHUNK)], fc, sem.at[1]
                )
                czk.start()
                cfp.start()
                czk.wait()
                cfp.wait()

                def body(j, _):
                    p = fc[j]
                    k = zc[j]
                    r = p // 128
                    c = p % 128
                    # masked 128-lane RMW of the target row (ascending id +
                    # strict < keeps the min id on ties)
                    zrow = zbuf_ref[r, :]
                    upd = (lane == c) & (k < zrow)
                    zbuf_ref[r, :] = jnp.where(upd, k, zrow)
                    irow = idbuf_ref[r, :]
                    idbuf_ref[r, :] = jnp.where(
                        upd, ci * CHUNK + j, irow
                    )
                    return 0

                jax.lax.fori_loop(0, CHUNK, body, 0)
                return 0

            jax.lax.fori_loop(0, nchunks, outer, 0)

        pl.run_scoped(
            scoped,
            zc=pltpu.SMEM((CHUNK,), jnp.int32),
            fc=pltpu.SMEM((CHUNK,), jnp.int32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


def pallas_zbuf(zkey, fpix, P_pad):
    A = zkey.shape[0]
    kernel = make_kernel(A, P_pad)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((P_pad // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((P_pad // 128, 128), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(zkey, fpix)


def xla_zbuf(zkey, fpix, ids, P):
    zbuf = jnp.full((P,), INT32_MAX, jnp.int32).at[fpix].min(zkey, mode="drop")
    win = zkey == zbuf[jnp.clip(fpix, 0, P - 1)]
    idbuf = jnp.full((P,), INT32_MAX, jnp.int32).at[
        jnp.where(win, fpix, P)
    ].min(ids, mode="drop")
    return zbuf, idbuf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", type=int, default=1 << 20)
    ap.add_argument("--interpret-check", action="store_true")
    args = ap.parse_args()

    P = 453_620
    P_pad = ((P + 127) // 128) * 128
    A = args.a
    rng = np.random.default_rng(0)
    zkey = jnp.asarray(rng.integers(0, 1 << 30, A).astype(np.int32))
    fpix = jnp.asarray(rng.integers(0, P, A).astype(np.int32))
    ids = jnp.arange(A, dtype=jnp.int32)

    if args.interpret_check:
        A2 = 4096
        zk2, fp2 = zkey[:A2], fpix[:A2]
        kernel = make_kernel(A2, P_pad)
        zb, ib = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((P_pad // 128, 128), jnp.int32),
                jax.ShapeDtypeStruct((P_pad // 128, 128), jnp.int32),
            ),
            interpret=True,
        )(zk2, fp2)
        zr, ir = xla_zbuf(zk2, fp2, jnp.arange(A2, dtype=jnp.int32), P)
        zb = np.asarray(zb).reshape(-1)[:P]
        ib = np.asarray(ib).reshape(-1)[:P]
        np.testing.assert_array_equal(zb, np.asarray(zr))
        np.testing.assert_array_equal(ib, np.asarray(ir))
        print("interpret check OK")
        return

    jx = jax.jit(lambda z, f: xla_zbuf(z, f, ids, P))
    jp = jax.jit(lambda z, f: pallas_zbuf(z, f, P_pad))

    for name, fn in (("xla 2-pass", jx), ("pallas 1-pass", jp)):
        z2, i2 = fn(zkey, fpix)
        _ = int(z2.reshape(-1)[0])
        t0 = time.perf_counter()
        c = jnp.int32(0)
        iters = 6
        for _ in range(iters):
            z2, i2 = fn(zkey + (c & 0), fpix)
            c = z2.reshape(-1)[0]
        _ = int(c)
        print(f"{name:16s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
