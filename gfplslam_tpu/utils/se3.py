"""SE(3) Lie-group math and covariance transport, pure ``jnp``.

Capability parity with the reference's Eigen helpers (auxiliar.h:65-99,
auxiliar.cpp:154-310): exponential/log maps with the Rodrigues V-matrix,
inverse, adjoint, covariance composition/transport, g2o-ordering swap, and
quaternion conversion. All functions are batched-friendly (write for one
element, ``jax.vmap`` for many) and dtype-polymorphic (float32 on device,
float64 under ``jax.config.update('jax_enable_x64', True)`` for parity tests).

Convention: twists are 6-vectors ``[rho (translation part), phi (rotation)]``
matching the reference's ``expmap_se3`` ordering (auxiliar.cpp:165-182 uses
x(0..2)=translation, x(3..5)=rotation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def skew(v: jax.Array) -> jax.Array:
    """3-vector -> 3x3 skew-symmetric matrix (auxiliar.cpp:144-152)."""
    z = jnp.zeros((), dtype=v.dtype)
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z]),
    ])


def _sinc_coeffs(theta2: jax.Array):
    """Taylor-safe (A, B, C) = (sin t / t, (1-cos t)/t^2, (1 - A)/t^2)."""
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    return a, b, c


def _skew_sq(phi: jax.Array) -> jax.Array:
    """K(phi)^2 = phi phi^T - |phi|^2 I, computed without a matmul (keeps full
    fp32 accuracy regardless of platform matmul precision)."""
    theta2 = jnp.dot(phi, phi)
    return jnp.outer(phi, phi) - theta2 * jnp.eye(3, dtype=phi.dtype)


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues rotation: 3-vector -> 3x3 rotation matrix."""
    theta2 = jnp.dot(phi, phi)
    a, b, _ = _sinc_coeffs(theta2)
    return jnp.eye(3, dtype=phi.dtype) + a * skew(phi) + b * _skew_sq(phi)


def so3_log(r: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> rotation vector (auxiliar.cpp:185-210 behavior).

    theta = atan2(|skew-part|, (tr-1)/2): accurate near pi (where arccos
    loses precision) and forward-mode differentiable at the identity (where
    arccos'(1) is infinite and poisons pose-graph edge jacfwd)."""
    cos_t = jnp.clip((jnp.trace(r) - 1.0) * 0.5, -1.0, 1.0)
    w = 0.5 * jnp.stack([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    sin_t = jnp.sqrt(jnp.dot(w, w) + 1e-24)
    theta = jnp.arctan2(sin_t, cos_t)
    # near theta=0: log ~= w ; near theta=pi use axis from diagonal
    scale = jnp.where(theta < 1e-6, 1.0 + theta * theta / 6.0,
                      theta / jnp.maximum(sin_t, _EPS))
    generic = scale * w
    # theta -> pi branch: axis from largest diagonal of (R + I)/2
    rr = (r + jnp.eye(3, dtype=r.dtype)) * 0.5
    diag = jnp.clip(jnp.diagonal(rr), 0.0, None)
    axis_sq = jnp.sqrt(diag + _EPS)
    k = jnp.argmax(diag)
    col = rr[:, k] / jnp.maximum(axis_sq[k], _EPS)
    axis = col / jnp.maximum(jnp.linalg.norm(col), _EPS)
    # fix sign using the skew part
    sign = jnp.where(jnp.dot(axis, w) < 0, -1.0, 1.0)
    near_pi = theta * sign * axis
    return jnp.where(theta > 3.1415, near_pi, generic)


def left_jacobian_so3(phi: jax.Array) -> jax.Array:
    """V matrix in exp([rho, phi]) = [R, V rho; 0 1] (auxiliar.cpp:171-179)."""
    theta2 = jnp.dot(phi, phi)
    _, b, c = _sinc_coeffs(theta2)
    return jnp.eye(3, dtype=phi.dtype) + b * skew(phi) + c * _skew_sq(phi)


def expmap_se3(x: jax.Array) -> jax.Array:
    """Twist [rho, phi] -> 4x4 homogeneous transform (auxiliar.cpp:165-182)."""
    rho, phi = x[:3], x[3:]
    r = so3_exp(phi)
    v = left_jacobian_so3(phi)
    t = v @ rho
    top = jnp.concatenate([r, t[:, None]], axis=1)
    bot = jnp.concatenate(
        [jnp.zeros((1, 3), dtype=x.dtype), jnp.ones((1, 1), dtype=x.dtype)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def logmap_se3(t: jax.Array) -> jax.Array:
    """4x4 transform -> twist [rho, phi] (auxiliar.cpp:185-243)."""
    phi = so3_log(t[:3, :3])
    v = left_jacobian_so3(phi)
    rho = jnp.linalg.solve(v, t[:3, 3])
    return jnp.concatenate([rho, phi])


def inverse_se3(t: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse (auxiliar.cpp:246-254)."""
    r = t[:3, :3]
    p = t[:3, 3]
    top = jnp.concatenate([r.T, (-(r.T @ p))[:, None]], axis=1)
    bot = jnp.concatenate(
        [jnp.zeros((1, 3), dtype=t.dtype), jnp.ones((1, 1), dtype=t.dtype)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def adjoint_se3(t: jax.Array) -> jax.Array:
    """6x6 adjoint of T, ordering [rho, phi] (auxiliar.cpp:257-267)."""
    r = t[:3, :3]
    p = t[:3, 3]
    z = jnp.zeros((3, 3), dtype=t.dtype)
    top = jnp.concatenate([r, skew(p) @ r], axis=1)
    bot = jnp.concatenate([z, r], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def transport_cov_se3(t: jax.Array, cov: jax.Array) -> jax.Array:
    """Transport a 6x6 twist covariance through T: Adj(T) cov Adj(T)^T
    (uncTinv_se3 / unccomp_se3 composition pattern, auxiliar.cpp:270-291)."""
    adj = adjoint_se3(t)
    return adj @ cov @ adj.T


def reverse_se3(t: jax.Array) -> jax.Array:
    """Swap the reference's internal twist ordering with g2o's
    [phi, rho] ordering at the transform level (auxiliar.cpp:294-310):
    returns the same transform — kept for API parity; twist reorder is
    :func:`reverse_twist`."""
    return t


def reverse_twist(x: jax.Array) -> jax.Array:
    """[rho, phi] <-> [phi, rho] 6-vector swap."""
    return jnp.concatenate([x[3:], x[:3]])


def to_quaternion(r: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion [qx, qy, qz, qw] (auxiliar.cpp:313-340),
    robust Shepperd-style branch selection, batched-safe via where-combines."""
    m00, m01, m02 = r[0, 0], r[0, 1], r[0, 2]
    m10, m11, m12 = r[1, 0], r[1, 1], r[1, 2]
    m20, m21, m22 = r[2, 0], r[2, 1], r[2, 2]
    tr = m00 + m11 + m22

    def case_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, _EPS)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s])

    def case_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s])

    def case_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s])

    def case_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s])

    use_w = tr > 0
    use_x = (m00 >= m11) & (m00 >= m22)
    use_y = m11 >= m22
    q = jnp.where(use_w, case_w(),
                  jnp.where(use_x, case_x(), jnp.where(use_y, case_y(), case_z())))
    return q / jnp.linalg.norm(q)


def quaternion_to_rotation(q: jax.Array) -> jax.Array:
    """Quaternion [qx,qy,qz,qw] -> rotation matrix."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)]),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)]),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]),
    ])


def transform_point(t: jax.Array, p: jax.Array) -> jax.Array:
    """Apply 4x4 transform to a 3-point."""
    return t[:3, :3] @ p + t[:3, 3]


def is_finite(x: jax.Array) -> jax.Array:
    """All-finite predicate (auxiliar.h:87)."""
    return jnp.all(jnp.isfinite(x))
