"""Fused Pallas TPU kernel for the depth preprocessing stencil chain.

The reference runs three fullscreen stencil passes per frame
(depth_filter.frag -> depth_smooth.frag -> depth_filter.frag, driven at
src/SurfelMapping.cpp:269-334).  ops/preprocess.py re-expresses them as jnp
shifted-slice stencils; XLA lowers the 169-tap class-gated smooth to ~26 ms
at KITTI resolution — ~50x off the VPU roofline, because every tap round-
trips HBM.  This kernel computes the WHOLE chain (support filter t1 ->
gated Gaussian smooth -> support filter t2) in one pallas_call: each row
band is read into VMEM once, the intermediate images live in VMEM scratch
(recomputed on the halo), and one output tile is written.

Shapes/looping are deliberate TPU choices:
  * overlapping row bands come from passing the padded image three times
    with row-block index maps (i, i+1, i+2) — halos without manual DMA;
  * the tap loops run as lax.fori_loop with pl.ds dynamic slices out of
    VMEM scratch refs; a fully unrolled python loop makes Mosaic allocate
    per-tap stack temps (measured: 56 MB scoped-vmem OOM at radius 6);
  * column taps are dynamic lane-dim slices of a scratch that embeds the
    image at a 256-column offset, so every (row, col) tap window stays in
    bounds without wrap-around.

Numerical parity: identical mask logic to ops/preprocess.py (the
reference's inb / same-class / range gates, the col >= stereo_border
neighbour gate of depth_smooth.frag:51, and the sigma quirk documented in
PipelineParams.smooth_sig_pix).  tests/test_pallas_preprocess.py asserts
equality against the jnp path on the interpret backend (odd heights, stereo
border, class boundaries, degenerate frames).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CameraIntrinsics, PipelineParams

TH = 64        # output rows per grid step
CO = 256       # column offset of the image inside the padded band
CW = 128       # column offset of the compute window (taps reach CO +- 128)


def _roundup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(H: int, W: int, PW: int, p: PipelineParams):
    R = p.smooth_radius
    D = 2 * R + 1
    sig = p.smooth_sig_pix
    PWW = PW - 2 * CW  # compute-window width (taps stay in [0, PW))
    # region geometry within the (3*TH, PW) band (rows are band-relative):
    #   output (support t2):   rows [TH, 2*TH)
    #   smooth:                rows [TH-1, 2*TH+1)      -> S0, SH
    #   support t1:            rows [S0-R-1, S0+SH+R+1) -> F0, FH
    # needs F0 >= 1 i.e. TH >= R + 3 (TH=64 admits R <= 61)
    S0, SH = TH - 1, TH + 2
    F0, FH = S0 - R - 1, SH + 2 * R + 2

    def support_pass(bd, bs, r0d: int, r0s: int, h: int, row_abs, thresh: float):
        """depth_filter.frag over ``h`` rows on the compute window: keep
        depth iff >= filter_support_min of the 8 neighbours are in-image,
        within ``thresh`` and same class; zero removed classes /
        out-of-range.  ``r0d``/``r0s`` are the first region row in the depth
        / semantic refs (their row origins differ for the t2 pass);
        ``row_abs`` is the first region row in IMAGE coordinates."""
        dC = bd[r0d:r0d + h, CW:CW + PWW]
        sC = bs[r0s:r0s + h, CW:CW + PWW]
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, PWW), 0) + row_abs
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, PWW), 1) + CW - CO

        support = jnp.zeros((h, PWW), jnp.int32)
        # dy unrolled (Mosaic needs static sublane-dim slice starts); dx is
        # a dynamic LANE ROLL inside fori_loop so temps are reused (dynamic
        # pl.ds starts must be 128-aligned; roll has no such constraint)
        for dy in (-1, 0, 1):
            band_d = bd[r0d + dy:r0d + dy + h, :]
            band_s = bs[r0s + dy:r0s + dy + h, :]

            def tap(t, sup, band_d=band_d, band_s=band_s, dy=dy):
                dx = t - 1
                dk = pltpu.roll(band_d, (-dx) % PW, 1)[:, CW:CW + PWW]
                ck = pltpu.roll(band_s, (-dx) % PW, 1)[:, CW:CW + PWW]
                inb = (
                    (rows + dy >= 0) & (rows + dy < H)
                    & (cols + dx >= 0) & (cols + dx < W)
                    & ((dy != 0) | (dx != 0))
                )
                ok = inb & (jnp.abs(dk - dC) < thresh) & (ck == sC)
                return sup + ok.astype(jnp.int32)

            support = jax.lax.fori_loop(0, 3, tap, support)
        removed = (
            (dC <= p.near_clip)
            | (dC >= p.filter_cap_depth)
            | (sC == p.sky_class)
            | (sC == p.person_class)
            | (sC == p.rider_class)
        )
        keep = (~removed) & (support >= p.filter_support_min)
        return jnp.where(keep, dC, 0.0)

    def kernel(d0, d1, d2, s0, s1, s2, out_ref, bd, bs, f1r):
        i = pl.program_id(0)
        row0 = i * TH - TH  # image row of band row 0
        bd[0:TH, :] = d0[:]
        bd[TH:2 * TH, :] = d1[:]
        bd[2 * TH:3 * TH, :] = d2[:]
        bs[0:TH, :] = s0[:]
        bs[TH:2 * TH, :] = s1[:]
        bs[2 * TH:3 * TH, :] = s2[:]

        # --- support t1 on rows [F0, F0+FH) -> f1 scratch ------------------
        f1r[:, :] = jnp.zeros((FH, PW), jnp.float32)
        f1r[:, CW:CW + PWW] = support_pass(
            bd, bs, F0, F0, FH, row0 + F0, p.filter_diff_thresh_1
        )

        # --- depth_smooth.frag on rows [S0, S0+SH) -------------------------
        sC = bs[S0:S0 + SH, CW:CW + PWW]
        dC = f1r[S0 - F0:S0 - F0 + SH, CW:CW + PWW]
        rows = jax.lax.broadcasted_iota(jnp.int32, (SH, PWW), 0) + row0 + S0
        cols = jax.lax.broadcasted_iota(jnp.int32, (SH, PWW), 1) + CW - CO
        colf = cols.astype(jnp.float32)

        zf = jnp.zeros((SH, PWW), jnp.float32)
        num, den, cnt = zf, zf, jnp.zeros((SH, PWW), jnp.int32)
        # dy unrolled (static sublane starts); dx walks the lane dim with an
        # INCREMENTAL roll-by-one carried through the fori (static shifts
        # lower to cheap lane rotates; a fresh dynamic roll per tap does not)
        for dy in range(-R, R + 1):
            start_d = pltpu.roll(f1r[S0 - F0 + dy:S0 - F0 + dy + SH, :], R, 1)
            start_s = pltpu.roll(bs[S0 + dy:S0 + dy + SH, :], R, 1)

            def smooth_tap(t, carry, dy=dy):
                (num, den, cnt), (band_f1, band_s) = carry
                dx = t - R
                dk = band_f1[:, CW:CW + PWW]
                ck = band_s[:, CW:CW + PWW]
                # neighbour gates: in-image, right of the stereo border
                # (depth_smooth.frag:51 tests texX = col + 0.5 >= border),
                # in-range, same class
                ok = (
                    (rows + dy >= 0) & (rows + dy < H)
                    & (cols + dx >= 0) & (cols + dx < W)
                    & (colf + (dx.astype(jnp.float32) + 0.5) >= p.stereo_border)
                    & (dk > p.near_clip) & (dk < p.filter_cap_depth)
                    & (ck == sC)
                )
                r2 = (dy * dy + dx * dx).astype(jnp.float32)
                w = jnp.exp(-(r2 * sig))
                okf = ok.astype(jnp.float32)
                acc = (num + okf * dk * w, den + okf * w,
                       cnt + ok.astype(jnp.int32))
                nxt = (pltpu.roll(band_f1, PW - 1, 1),
                       pltpu.roll(band_s, PW - 1, 1))
                return acc, nxt

            (num, den, cnt), _ = jax.lax.fori_loop(
                0, D, smooth_tap, ((num, den, cnt), (start_d, start_s))
            )
        smoothed = jnp.where(cnt > 0, num / jnp.maximum(den, 1e-30), 0.0)
        removed = (
            (dC <= p.near_clip) | (dC >= p.filter_cap_depth)
            | (sC == p.sky_class)
        )
        smoothed = jnp.where(removed, 0.0, smoothed)

        # --- support t2 over the smooth region, emit the center TH rows ----
        # reuse the f1 scratch rows [0, SH) to hold the smooth image
        # (smooth row q <-> band row S0 + q <-> image row row0 + S0 + q)
        f1r[0:SH, :] = jnp.zeros((SH, PW), jnp.float32)
        f1r[0:SH, CW:CW + PWW] = smoothed
        out = support_pass(
            f1r, bs, 1, S0 + 1, TH, row0 + S0 + 1, p.filter_diff_thresh_2
        )
        out_ref[:, :] = jnp.zeros((TH, PW), jnp.float32)
        out_ref[:, CW:CW + PWW] = out

    return kernel, FH


@functools.partial(jax.jit, static_argnames=("cam", "params", "interpret"))
def preprocess_stencil_tpu(
    metric: jax.Array,
    semantic: jax.Array,
    cam: CameraIntrinsics,
    params: PipelineParams,
    interpret: bool = False,
) -> jax.Array:
    """support(t1) -> gated smooth -> support(t2) as one fused TPU kernel.

    ``metric`` is the metricized depth (metricize_depth output, f32[H,W]);
    returns the DEPTH_FILTERED f32[H,W] image (preprocess_frame contract).
    """
    H, W = cam.height, cam.width
    R = params.smooth_radius
    if TH < R + 3:
        raise ValueError(f"smooth_radius {R} too large for row tile {TH}")
    G = -(-H // TH)
    PW = CO + _roundup(W + R, 128) + CW + 128
    PH = TH * (G + 2)

    pad_d = jnp.zeros((PH, PW), jnp.float32)
    pad_d = jax.lax.dynamic_update_slice(pad_d, metric, (TH, CO))
    pad_s = jnp.full((PH, PW), -1, jnp.int32)
    pad_s = jax.lax.dynamic_update_slice(
        pad_s, semantic.astype(jnp.int32), (TH, CO)
    )

    kernel, FH = _make_kernel(H, W, PW, params)

    def blk(off):
        return pl.BlockSpec(
            (TH, PW), lambda i, o=off: (i + o, 0), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G * TH, PW), jnp.float32),
        grid=(G,),
        in_specs=[blk(0), blk(1), blk(2), blk(0), blk(1), blk(2)],
        out_specs=pl.BlockSpec(
            (TH, PW), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * TH, PW), jnp.float32),   # depth band
            pltpu.VMEM((3 * TH, PW), jnp.int32),     # semantic band
            pltpu.VMEM((FH, PW), jnp.float32),       # f1 / smooth scratch
        ],
        interpret=interpret,
    )(pad_d, pad_d, pad_d, pad_s, pad_s, pad_s)
    return jax.lax.slice(out, (0, CO), (H, CO + W))
