"""SE(3) helpers shared by all pipeline stages.

The reference passes 4x4 ``Eigen::Matrix4f`` poses into every shader
(e.g. src/Shaders/data.vert:23, conflict.vert:16); here poses are f32[4,4]
jnp arrays, camera-to-world unless suffixed ``_inv``.

All matmuls here carry ``Precision.HIGHEST``: on TPU the default f32 matmul
runs the MXU in bf16 (~8 mantissa bits), which at 10-30 m scene scale is
several-cm positional error — fatal for surfel association gates and ICP.
These products are 3x3/4x4-by-N and contribute nothing to the FLOP budget,
so full-precision passes are free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply a 4x4 rigid transform to [..., 3] points."""
    return jnp.matmul(pts, T[:3, :3].T, precision=HIGHEST) + T[:3, 3]


def rotate_vectors(T: jax.Array, vecs: jax.Array) -> jax.Array:
    """Apply only the rotation part of a 4x4 transform to [..., 3] vectors."""
    return jnp.matmul(vecs, T[:3, :3].T, precision=HIGHEST)


def transform_planar(T: jax.Array, x: jax.Array, y: jax.Array, z: jax.Array):
    """Rigid transform on planar point columns -> (x', y', z').

    Componentized so no (N,3) temp is ever materialized (XLA pads trailing-3
    arrays 42.7x on TPU — see surfels.py layout notes)."""
    R, t = T[:3, :3], T[:3, 3]
    return (
        R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0],
        R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1],
        R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2],
    )


def rotate_planar(T: jax.Array, x: jax.Array, y: jax.Array, z: jax.Array):
    """Rotation-only transform on planar vector columns -> (x', y', z')."""
    R = T[:3, :3]
    return (
        R[0, 0] * x + R[0, 1] * y + R[0, 2] * z,
        R[1, 0] * x + R[1, 1] * y + R[1, 2] * z,
        R[2, 0] * x + R[2, 1] * y + R[2, 2] * z,
    )


def normalize_planar(x: jax.Array, y: jax.Array, z: jax.Array):
    """Unit-normalize planar vector columns (safe at zero length)."""
    n = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-12)
    return x / n, y / n, z / n


def invert_se3(T: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid transform."""
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-jnp.matmul(R.T, t, precision=HIGHEST))
    return Ti


def compose(A: jax.Array, B: jax.Array) -> jax.Array:
    """Full-precision 4x4 pose composition A @ B."""
    return jnp.matmul(A, B, precision=HIGHEST)


def safe_normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Normalize without NaN on zero vectors (masked-out lanes stay finite)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def exp_se3(xi: jax.Array) -> jax.Array:
    """Exponential map from a 6-vector twist (v, w) to a 4x4 transform.

    Used by the ICP pose-refinement module (a capability the reference stubs
    out: src/SurfelMapping.h:29 takes ground-truth poses only).
    """
    v = xi[:3]
    w = xi[3:]
    theta = jnp.linalg.norm(w)
    theta = jnp.maximum(theta, 1e-12)
    K = jnp.array(
        [
            [0.0, -w[2], w[1]],
            [w[2], 0.0, -w[0]],
            [-w[1], w[0], 0.0],
        ],
        dtype=xi.dtype,
    )
    K = K / theta
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    KK = jnp.matmul(K, K, precision=HIGHEST)
    R = jnp.eye(3, dtype=xi.dtype) + s * K + (1.0 - c) * KK
    V = (
        jnp.eye(3, dtype=xi.dtype)
        + ((1.0 - c) / theta) * K
        + ((theta - s) / theta) * KK
    )
    small = jnp.linalg.norm(w) < 1e-8
    R = jnp.where(small, jnp.eye(3, dtype=xi.dtype), R)
    V = jnp.where(small, jnp.eye(3, dtype=xi.dtype), V)
    T = jnp.eye(4, dtype=xi.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(jnp.matmul(V, v, precision=HIGHEST))
    return T


def log_se3(T: jax.Array) -> jax.Array:
    """Logarithm map: 4x4 rigid transform -> 6-vector twist (v, w).

    Inverse of :func:`exp_se3`; used by the windowed-BA layer's pose-graph
    residuals (ba.py).  Numerically guarded at theta -> 0 and theta -> pi.
    """
    R = T[:3, :3]
    t = T[:3, 3]
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # w from the skew part; near theta=0 the first-order term is exact enough
    skew = jnp.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]], T.dtype
    )
    s = jnp.sin(theta)
    small = theta < 1e-6
    # w = theta / (2 sin theta) * skew   (theta < pi - eps; KITTI-scale
    # window increments never approach pi)
    factor = jnp.where(small, 0.5, theta / jnp.maximum(2.0 * s, 1e-12))
    w = factor * skew
    K = jnp.array(
        [
            [0.0, -w[2], w[1]],
            [w[2], 0.0, -w[0]],
            [-w[1], w[0], 0.0],
        ],
        T.dtype,
    )
    th = jnp.maximum(theta, 1e-12)
    KK = jnp.matmul(K, K, precision=HIGHEST)
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) K^2
    coef = jnp.where(
        small,
        1.0 / 12.0,
        (1.0 - th * s / (2.0 * jnp.maximum(1.0 - cos_theta, 1e-12))) / (th * th),
    )
    Vinv = jnp.eye(3, dtype=T.dtype) - 0.5 * K + coef * KK
    v = jnp.matmul(Vinv, t, precision=HIGHEST)
    return jnp.concatenate([v, w])


def adjoint_se3(T: jax.Array) -> jax.Array:
    """6x6 adjoint of a rigid transform for (v, w)-ordered twists:
    Adj(T) = [[R, [t]x R], [0, R]]."""
    R = T[:3, :3]
    t = T[:3, 3]
    tx = jnp.array(
        [
            [0.0, -t[2], t[1]],
            [t[2], 0.0, -t[0]],
            [-t[1], t[0], 0.0],
        ],
        T.dtype,
    )
    top = jnp.concatenate([R, jnp.matmul(tx, R, precision=HIGHEST)], axis=1)
    bot = jnp.concatenate([jnp.zeros((3, 3), T.dtype), R], axis=1)
    return jnp.concatenate([top, bot], axis=0)
