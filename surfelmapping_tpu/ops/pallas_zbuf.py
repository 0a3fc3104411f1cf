"""Production Pallas scatter-argmin z-buffer (TPU).

The index map (IndexMap::predictIndices, src/IndexMap.cpp:138-198) and both
splat renderers (draw_image_adaptive.geom z-test) reduce to the same op:
given A candidates with a monotone int32 depth key and a target pixel, find
per pixel the minimum key AND the minimum candidate id among the key
minimisers.  The XLA expression (ops/active.py:index_resolve) needs THREE
A-sized indexed-memory passes (scatter-min key, gather winner key,
scatter-min id), each costing ~9-13 ns per source element on TPU v5e.

This kernel resolves key and winner id in ONE streaming pass:

  * the full z- and id-buffers live in VMEM (1.8 MB each at KITTI
    resolution), laid out (ROWS, 128) so a pixel is (row, lane);
  * candidates stream HBM -> SMEM in chunks (scalar loads need SMEM —
    Mosaic has no scalar VMEM access at dynamic lanes; single-buffered:
    the DMA is far shorter than the scalar work it feeds, and Mosaic's
    remote compiler rejected dynamically-indexed SMEM slot buffers);
  * per candidate, one masked 128-lane row RMW updates key and id together
    (``lane == pix%128 & key < row``) — the tie rule is *min id* because
    ids are processed in ascending order with a strict compare;
  * the buffers are REPLICATED ``replicas`` times in separate scratch
    allocations; candidate j updates replica j%R, so the R row-RMWs in each
    unrolled group touch structurally disjoint buffers and the compiler can
    pipeline them (a single-buffer kernel serialises on the may-alias
    row dependence: measured 22 ns/candidate in tools/probe_pallas_zbuf.py);
  * a final dense pass folds the replicas with a lexicographic (key, id)
    min — pure VPU, ~0.2 ms.

Semantics match ``index_resolve`` exactly (tests/test_pallas_zbuf.py pins
them in interpret mode): invalid candidates carry key INT32_MAX (strict <
never writes) and any in-range filler pixel; empty pixels return
(INT32_MAX, INT32_MAX).

VMEM budget: replicas * 2 * ceil(P/128) * 512 B total (replica 0 lives in
the output buffers); at P=453 620 and R=2 this is 7.3 MB.  For the fast
renderer's 4-class buffer (P = 4 * 453 620, 14.5 MB) use ``replicas=1``.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT32_MAX = np.int32(2**31 - 1)
_LANES = 128
# HBM DMA slices must align to the int32 HBM tiling of 1024 elements, so the
# SMEM chunk is R * 2048 (always divisible by R and by the tiling; 1024-long
# chunks measured a pathological 250 ns/candidate at P=453k — some DMA
# granularity effect — while 2048 runs at the expected 14-22 ns)
_CHUNK_PER_R = 2048


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def use_pallas_zbuf() -> bool:
    """The Mosaic kernel runs on real TPU backends only; everywhere else the
    XLA 3-op fallback is the reference semantics (the parity tests pin the
    two against each other in interpret mode).  SMTPU_NO_PALLAS=1 forces the
    XLA path for A/B debugging — the same switch ops/preprocess.py honours."""
    if _os.environ.get("SMTPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover - backend not initialized
        return False


def zbuffer_argmin_auto(
    zkey: jax.Array, fpix: jax.Array, num_pix: int, replicas: int = 2,
    n_valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Backend-dispatched scatter-argmin z-buffer with candidate-index ids.

    TPU: the one-pass Pallas kernel.  Elsewhere: the XLA 3-op expression
    (scatter-min key, winner gather, scatter-min index) with identical
    semantics (``n_valid`` is a pure streaming bound — XLA scatters over
    invalid keys are no-ops anyway).  Returns (zbuf i32[P], idbuf i32[P]);
    empties INT32_MAX.
    """
    if use_pallas_zbuf():
        return zbuffer_argmin(
            zkey, fpix, num_pix, replicas=replicas, n_valid=n_valid
        )
    zbuf = jnp.full((num_pix,), INT32_MAX, jnp.int32).at[fpix].min(
        zkey, mode="drop"
    )
    valid = zkey != INT32_MAX
    win = valid & (zkey == zbuf[jnp.clip(fpix, 0, num_pix - 1)])
    ids = jnp.arange(zkey.shape[0], dtype=jnp.int32)
    idbuf = jnp.full((num_pix,), INT32_MAX, jnp.int32).at[
        jnp.where(win, fpix, num_pix)
    ].min(ids, mode="drop")
    return zbuf, idbuf


def _make_kernel(A: int, rows: int, replicas: int):
    R = replicas
    _CHUNK = R * _CHUNK_PER_R

    def kernel(nv_ref, zkey_hbm, fpix_hbm, zout, iout, *scratch):
        # replica 0 lives IN the output buffers (saves one 2x rows*512 B
        # VMEM pair and lets R=4 fit at KITTI resolution)
        zbufs = [zout] + list(scratch[: R - 1])
        ibufs = [iout] + list(scratch[R - 1 : 2 * (R - 1)])
        zc = scratch[2 * (R - 1)]
        fc = scratch[2 * (R - 1) + 1]
        sem = scratch[2 * (R - 1) + 2]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

        init = jnp.full((rows, _LANES), INT32_MAX, jnp.int32)
        for r in range(R):
            zbufs[r][:] = init
            ibufs[r][:] = init

        # dynamic bound: only the chunks covering the caller's valid prefix
        # stream in (cull/plan order valid blocks first; the pow2 budget can
        # otherwise make the padded tail larger than the live content)
        nv = jnp.clip(nv_ref[0, 0], 0, A)
        nchunks = jax.lax.div(nv + (_CHUNK - 1), _CHUNK)

        def chunk_body(ci, _):
            # stream this chunk's candidates into SMEM (scalar loads need
            # SMEM; single-buffered — the DMA of 2x chunk*4 B is far shorter
            # than the ~_CHUNK*15ns of scalar work it feeds)
            czk = pltpu.make_async_copy(
                zkey_hbm.at[pl.ds(ci * _CHUNK, _CHUNK)], zc, sem.at[0]
            )
            cfp = pltpu.make_async_copy(
                fpix_hbm.at[pl.ds(ci * _CHUNK, _CHUNK)], fc, sem.at[1]
            )
            czk.start()
            cfp.start()
            czk.wait()
            cfp.wait()

            base = ci * _CHUNK

            def group_body(j, _):
                jj = j * R
                # R candidates per iteration, one per replica: the row RMWs
                # below are to R DISTINCT scratch buffers, so they pipeline
                for r in range(R):
                    p = fc[jj + r]
                    k = zc[jj + r]
                    row = jax.lax.div(p, _LANES)
                    col = jax.lax.rem(p, _LANES)
                    zrow = zbufs[r][row, :]
                    upd = (lane[0] == col) & (k < zrow)
                    zbufs[r][row, :] = jnp.where(upd, k, zrow)
                    irow = ibufs[r][row, :]
                    ibufs[r][row, :] = jnp.where(upd, base + jj + r, irow)
                return 0

            jax.lax.fori_loop(0, _CHUNK_PER_R, group_body, 0)
            return 0

        jax.lax.fori_loop(0, nchunks, chunk_body, 0)

        # dense lexicographic (key, id) fold of the replicas into replica 0
        # (the outputs)
        if R > 1:
            zbest = zbufs[0][:]
            ibest = ibufs[0][:]
            for r in range(1, R):
                zr = zbufs[r][:]
                ir = ibufs[r][:]
                take = (zr < zbest) | ((zr == zbest) & (ir < ibest))
                zbest = jnp.where(take, zr, zbest)
                ibest = jnp.where(take, ir, ibest)
            zout[:] = zbest
            iout[:] = ibest

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_pix", "replicas", "interpret")
)
def zbuffer_argmin(
    zkey: jax.Array,
    fpix: jax.Array,
    num_pix: int,
    replicas: int = 2,
    interpret: bool = False,
    n_valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One-pass scatter-argmin z-buffer.

    Args:
      zkey: i32[A] monotone depth keys; INT32_MAX = invalid (never written).
      fpix: i32[A] flat target pixel; invalid candidates may use any value
        in [0, num_pix] (num_pix itself lands in the padding and is
        discarded).
      num_pix: P — pixels in the target image.
      replicas: buffer replication factor (ILP).  VMEM = replicas * 2 *
        ceil(P/128) rows of 512 B (replica 0 lives in the outputs).
        Measured TPU v5e at P=453k, A=1M: R=2 13.6 ns/cand vs the XLA
        3-op path's 28 ns (coherent order) / 232 ns (random order).
        R=1 (~22 ns) is the fallback for P too large for two pairs.
      n_valid: optional dynamic i32 — every candidate at index >= n_valid
        is invalid (the caller orders valid content first), and the kernel
        streams only the covering chunks.  None = process all A.  With pow2
        cull budgets the padded tail can exceed the live content (measured:
        a full-budget render streamed 16.8M slots for 4.4M live surfels).

    Returns (zbuf i32[P], idbuf i32[P]): per-pixel min key and min candidate
    index among the minimisers; empty pixels are INT32_MAX in both.
    """
    A = zkey.shape[0]
    chunk = replicas * _CHUNK_PER_R
    Ap = _round_up(max(A, chunk), chunk)
    if Ap != A:
        zkey = jnp.pad(zkey, (0, Ap - A), constant_values=INT32_MAX)
        fpix = jnp.pad(fpix, (0, Ap - A), constant_values=0)
    # one spare row so fpix == num_pix stays in range
    rows = _round_up(num_pix + 1, _LANES) // _LANES
    kernel = _make_kernel(Ap, rows, replicas)
    scratch = (
        [pltpu.VMEM((rows, _LANES), jnp.int32)
         for _ in range(2 * (replicas - 1))]
        + [
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    )
    if n_valid is None:
        nv = jnp.full((1, 1), Ap, jnp.int32)
    else:
        nv = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)
    # explicit VMEM budget: 2*replicas buffer planes + slack for the chunk
    # DMAs (Mosaic's default limit rejects the 14.5 MB renderer shape)
    vmem_bytes = 2 * replicas * rows * _LANES * 4 + (1 << 21)
    zb, ib = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 100 * (1 << 20))
        ),
        interpret=interpret,
    )(nv, zkey, fpix)
    return zb.reshape(-1)[:num_pix], ib.reshape(-1)[:num_pix]
