"""Quaternion <-> rotation-matrix conversions (scalar-last XYZW convention).

Behavioral parity target: the reference's PyTorch3D-derived helpers
(reference ``vggt/utils/rotation.py:14-132``). Quaternions are stored
scalar-last (i, j, k, r) to match the VGGT pose encoding layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_mat(quaternions: jax.Array) -> jax.Array:
    """Convert scalar-last quaternions (..., 4) to rotation matrices (..., 3, 3)."""
    i, j, k, r = jnp.split(quaternions, 4, axis=-1)
    i, j, k, r = i[..., 0], j[..., 0], k[..., 0], r[..., 0]
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with a zero subgradient at x == 0."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), jnp.zeros_like(x))


def standardize_quaternion(quaternions: jax.Array) -> jax.Array:
    """Flip sign so the (scalar-last) real part is non-negative."""
    return jnp.where(quaternions[..., 3:4] < 0, -quaternions, quaternions)


def mat_to_quat(matrix: jax.Array) -> jax.Array:
    """Convert rotation matrices (..., 3, 3) to scalar-last quaternions (..., 4).

    Uses the numerically robust 4-candidate construction: one candidate per
    quaternion component, pick the best-conditioned (largest |q| denominator).
    """
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [m[..., t] for t in range(9)]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # Candidate quaternions (in rijk order), each scaled by one of r,i,j,k.
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        quat_candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]

    # rijk -> ijkr (scalar-last)
    out = out[..., jnp.array([1, 2, 3, 0])]
    return standardize_quaternion(out)
