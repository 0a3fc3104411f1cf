"""Debug matrix for the zbuf kernel: R=1 Mosaic crash, R=4 runtime failure,
vmem_limit effects, and an output-resident (scratch-free) variant for the
renderer's 4-class buffers.

Run: python tools/probe_zbuf_variants.py
"""
import sys
import time
import traceback

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MAX = np.int32(2**31 - 1)
_LANES = 128


def make_outres_kernel(A: int, rows: int, chunk: int):
    """Output-resident single-replica kernel: the VMEM outputs ARE the
    working buffers (no scratch replicas) — the renderer shape."""

    def kernel(zkey_hbm, fpix_hbm, zout, iout, zc, fc, sem):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        zout[:] = jnp.full((rows, _LANES), INT32_MAX, jnp.int32)
        iout[:] = jnp.full((rows, _LANES), INT32_MAX, jnp.int32)
        nchunks = A // chunk

        def chunk_body(ci, _):
            czk = pltpu.make_async_copy(
                zkey_hbm.at[pl.ds(ci * chunk, chunk)], zc, sem.at[0]
            )
            cfp = pltpu.make_async_copy(
                fpix_hbm.at[pl.ds(ci * chunk, chunk)], fc, sem.at[1]
            )
            czk.start()
            cfp.start()
            czk.wait()
            cfp.wait()
            base = ci * chunk

            def body(j, _):
                p = fc[j]
                k = zc[j]
                row = jax.lax.div(p, _LANES)
                col = jax.lax.rem(p, _LANES)
                zrow = zout[row, :]
                upd = (lane[0] == col) & (k < zrow)
                zout[row, :] = jnp.where(upd, k, zrow)
                irow = iout[row, :]
                iout[row, :] = jnp.where(upd, base + j, irow)
                return 0

            jax.lax.fori_loop(0, chunk, body, 0)
            return 0

        jax.lax.fori_loop(0, nchunks, chunk_body, 0)

    return kernel


def outres(zkey, fpix, num_pix, chunk=1024, vmem_mb=None):
    A = zkey.shape[0]
    rows = -(-(num_pix + 1) // _LANES)
    params = {}
    if vmem_mb:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024
        )
    zb, ib = pl.pallas_call(
        make_outres_kernel(A, rows, chunk),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        **params,
    )(zkey, fpix)
    return zb.reshape(-1)[:num_pix], ib.reshape(-1)[:num_pix]


def bench(fn, zkey, fpix, iters=5):
    z, i = fn(zkey, fpix)
    _ = int(z[0])
    t0 = time.perf_counter()
    c = jnp.int32(0)
    for _ in range(iters):
        z, i = fn(zkey + (c & 0), fpix)
        c = z[0]
    _ = int(c)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from surfelmapping_tpu.ops.pallas_zbuf import zbuffer_argmin

    A = 1 << 20
    rng = np.random.default_rng(0)
    zkey = jnp.asarray(rng.integers(0, 1 << 30, A).astype(np.int32))

    cases = [
        ("P=453k R=1", lambda z, f: zbuffer_argmin(z, f, 453_620, replicas=1)),
        ("P=453k R=3", lambda z, f: zbuffer_argmin(z, f, 453_620, replicas=3)),
        ("P=453k outres c1024", lambda z, f: outres(z, f, 453_620)),
        ("P=453k outres c2048",
         lambda z, f: outres(z, f, 453_620, chunk=2048)),
        ("P=1.81M outres (4-class renderer shape)",
         lambda z, f: outres(z, f, 4 * 453_620)),
        ("P=1.81M outres vmem=100MB",
         lambda z, f: outres(z, f, 4 * 453_620, vmem_mb=100)),
        ("P=453k R=4 vmem100",
         None),
    ]
    for name, fn in cases:
        if fn is None:
            continue
        P = 4 * 453_620 if "1.81M" in name else 453_620
        fpix = jnp.asarray(rng.integers(0, P, A).astype(np.int32))
        try:
            t = bench(jax.jit(fn), zkey, fpix)
            print(f"{name:42s} {t:8.2f} ms ({t*1e6/A:5.1f} ns/cand)",
                  flush=True)
        except Exception as e:
            print(f"{name:42s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            if "R=1" in name:
                traceback.print_exc(limit=3)


if __name__ == "__main__":
    main()
