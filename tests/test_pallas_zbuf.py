"""Pallas scatter-argmin z-buffer: interpret-mode parity vs the XLA
index_resolve reference (ops/active.py) — key min, min-id tie-break,
invalid-candidate and empty-pixel conventions."""

import numpy as np
import jax.numpy as jnp
import pytest

from surfelmapping_tpu.ops.active import index_resolve
from surfelmapping_tpu.ops.index_map import INT32_MAX
from surfelmapping_tpu.ops.pallas_zbuf import zbuffer_argmin


def _xla_reference(zkey, fpix, P):
    zbuf = jnp.full((P,), INT32_MAX, jnp.int32).at[fpix].min(zkey, mode="drop")
    ids = jnp.arange(zkey.shape[0], dtype=jnp.int32)
    idbuf = index_resolve(zkey, fpix, ids, P, depth_buf=zbuf,
                          empty_to_minus1=False)
    return np.asarray(zbuf), np.asarray(idbuf)


@pytest.mark.parametrize("replicas", [1, 3])
def test_parity_random_candidates(replicas):
    rng = np.random.default_rng(0)
    P = 5000
    A = 4096
    zkey = rng.integers(0, 1 << 20, A).astype(np.int32)
    fpix = rng.integers(0, P, A).astype(np.int32)
    # sprinkle invalids (key INT32_MAX, filler pixel P like index_candidates)
    inval = rng.uniform(size=A) < 0.3
    zkey[inval] = INT32_MAX
    fpix[inval] = P

    zb, ib = zbuffer_argmin(
        jnp.asarray(zkey), jnp.asarray(fpix), P, replicas=replicas,
        interpret=True,
    )
    zr, ir = _xla_reference(jnp.asarray(zkey), jnp.asarray(fpix), P)
    np.testing.assert_array_equal(np.asarray(zb), zr)
    np.testing.assert_array_equal(np.asarray(ib), ir)


def test_min_id_tie_break_and_padding():
    # equal keys on one pixel -> the LOWEST candidate id must win, across
    # replica boundaries (ids 3,4,5 land in different replicas at R=3)
    P = 200
    A = 4096  # kernel pads to the chunk size internally from smaller inputs
    zkey = np.full(A, INT32_MAX, np.int32)
    fpix = np.zeros(A, np.int32)
    for cid in (3, 4, 5):
        zkey[cid] = 77
        fpix[cid] = 13
    zkey[9] = 12
    fpix[9] = 99
    zb, ib = zbuffer_argmin(
        jnp.asarray(zkey), jnp.asarray(fpix), P, replicas=3, interpret=True
    )
    zb, ib = np.asarray(zb), np.asarray(ib)
    assert zb[13] == 77 and ib[13] == 3
    assert zb[99] == 12 and ib[99] == 9
    empties = np.ones(P, bool)
    empties[[13, 99]] = False
    assert (zb[empties] == INT32_MAX).all()
    assert (ib[empties] == INT32_MAX).all()


def test_n_valid_prefix_bound():
    """With n_valid, only the valid prefix must be streamed; the (invalid)
    tail beyond it may be skipped entirely, and a partial last chunk is
    handled (every candidate >= n_valid is invalid by contract)."""
    rng = np.random.default_rng(2)
    P = 2000
    A = 8192
    nv = 3000  # not a chunk multiple
    zkey = np.full(A, INT32_MAX, np.int32)
    fpix = np.full(A, P, np.int32)
    zkey[:nv] = rng.integers(0, 1 << 20, nv)
    fpix[:nv] = rng.integers(0, P, nv)
    zb, ib = zbuffer_argmin(
        jnp.asarray(zkey), jnp.asarray(fpix), P, replicas=2,
        interpret=True, n_valid=jnp.int32(nv),
    )
    zr, ir = _xla_reference(jnp.asarray(zkey), jnp.asarray(fpix), P)
    np.testing.assert_array_equal(np.asarray(zb), zr)
    np.testing.assert_array_equal(np.asarray(ib), ir)


def test_non_chunk_multiple_input_is_padded():
    P = 300
    rng = np.random.default_rng(1)
    A = 1000  # not a multiple of the internal chunk
    zkey = rng.integers(0, 1 << 20, A).astype(np.int32)
    fpix = rng.integers(0, P, A).astype(np.int32)
    zb, ib = zbuffer_argmin(
        jnp.asarray(zkey), jnp.asarray(fpix), P, replicas=2, interpret=True
    )
    zr, ir = _xla_reference(jnp.asarray(zkey), jnp.asarray(fpix), P)
    np.testing.assert_array_equal(np.asarray(zb), zr)
    np.testing.assert_array_equal(np.asarray(ib), ir)
