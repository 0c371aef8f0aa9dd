"""SE(3) math vs closed forms and scipy oracle (auxiliar.cpp parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from gfplslam_tpu.utils import se3


def random_twists(rng, n, scale=1.0):
    return rng.normal(size=(n, 6)).astype(np.float32) * scale


def test_expmap_identity():
    t = se3.expmap_se3(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(t), np.eye(4), atol=1e-6)


def test_exp_log_roundtrip(rng):
    xs = random_twists(rng, 64, scale=0.8)
    ts = jax.vmap(se3.expmap_se3)(jnp.asarray(xs))
    back = jax.vmap(se3.logmap_se3)(ts)
    np.testing.assert_allclose(np.asarray(back), xs, rtol=1e-3, atol=1e-4)


def test_rotation_vs_scipy(rng):
    phis = rng.normal(size=(32, 3)).astype(np.float32)
    ours = np.asarray(jax.vmap(se3.so3_exp)(jnp.asarray(phis)))
    theirs = Rotation.from_rotvec(phis).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_log_near_pi():
    phi = np.array([0.0, 0.0, np.pi - 1e-4], np.float32)
    r = Rotation.from_rotvec(phi).as_matrix().astype(np.float32)
    back = np.asarray(se3.so3_log(jnp.asarray(r)))
    np.testing.assert_allclose(back, phi, atol=5e-3)


def test_inverse(rng):
    x = jnp.asarray(random_twists(rng, 1)[0])
    t = se3.expmap_se3(x)
    np.testing.assert_allclose(
        np.asarray(t @ se3.inverse_se3(t)), np.eye(4), atol=1e-5)


def test_adjoint_property(rng):
    # Adj(T) x  ==  log(T exp(x) T^-1) for small x
    xt = jnp.asarray(random_twists(rng, 1, scale=0.5)[0])
    small = jnp.asarray(random_twists(rng, 1, scale=1e-3)[0])
    t = se3.expmap_se3(xt)
    lhs = se3.adjoint_se3(t) @ small
    rhs = se3.logmap_se3(t @ se3.expmap_se3(small) @ se3.inverse_se3(t))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-2, atol=1e-5)


def test_quaternion_roundtrip(rng):
    phis = rng.normal(size=(32, 3)).astype(np.float32)
    rs = Rotation.from_rotvec(phis).as_matrix().astype(np.float32)
    for r in rs:
        q = np.asarray(se3.to_quaternion(jnp.asarray(r)))
        q_ref = Rotation.from_matrix(r).as_quat()  # scipy xyzw, ours xyzw
        # quaternions are sign-ambiguous
        if np.dot(q, q_ref) < 0:
            q_ref = -q_ref
        np.testing.assert_allclose(q, q_ref, atol=1e-4)


def test_transport_cov(rng):
    x = jnp.asarray(random_twists(rng, 1, scale=0.5)[0])
    t = se3.expmap_se3(x)
    cov = jnp.eye(6) * 0.1
    out = se3.transport_cov_se3(t, cov)
    # symmetric PSD
    o = np.asarray(out)
    np.testing.assert_allclose(o, o.T, atol=1e-5)
    assert np.all(np.linalg.eigvalsh(o) > 0)


def test_is_finite():
    assert bool(se3.is_finite(jnp.ones(3)))
    assert not bool(se3.is_finite(jnp.array([1.0, jnp.nan])))


def test_jit_compatible():
    f = jax.jit(lambda x: se3.logmap_se3(se3.expmap_se3(x)))
    x = jnp.array([0.1, -0.2, 0.3, 0.05, -0.02, 0.01])
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(x), atol=1e-5)
