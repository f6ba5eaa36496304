"""Tests for SO3/SE3/Sim3 tangent-space ops."""
import numpy as np
import jax
import jax.numpy as jnp

from jetson_slam_tpu.utils import lie

jax.config.update("jax_enable_x64", False)


def random_rotation(rng):
    phi = rng.normal(size=3)
    phi = phi / np.linalg.norm(phi) * rng.uniform(0, np.pi - 0.1)
    return np.asarray(lie.exp_so3(jnp.asarray(phi, jnp.float32)))


def test_exp_log_so3_roundtrip(rng):
    for _ in range(20):
        phi = rng.normal(size=3).astype(np.float32)
        phi *= rng.uniform(0.001, 2.9) / np.linalg.norm(phi)  # keep angle < pi
        R = lie.exp_so3(jnp.asarray(phi))
        back = np.asarray(lie.log_so3(R))
        np.testing.assert_allclose(back, phi, atol=2e-3)


def test_exp_so3_orthonormal(rng):
    phi = rng.normal(size=(8, 3)).astype(np.float32)
    R = np.asarray(lie.exp_so3(jnp.asarray(phi)))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99


def test_exp_log_se3_roundtrip(rng):
    for _ in range(10):
        xi = (rng.normal(size=6) * 0.5).astype(np.float32)
        R, t = lie.exp_se3(jnp.asarray(xi))
        back = np.asarray(lie.log_se3(R, t))
        np.testing.assert_allclose(back, xi, atol=2e-4)


def test_se3_compose_inverse(rng):
    xi1 = (rng.normal(size=6) * 0.3).astype(np.float32)
    xi2 = (rng.normal(size=6) * 0.3).astype(np.float32)
    R1, t1 = lie.exp_se3(jnp.asarray(xi1))
    R2, t2 = lie.exp_se3(jnp.asarray(xi2))
    Rc, tc = lie.se3_compose(R1, t1, R2, t2)
    Ri, ti = lie.se3_inverse(Rc, tc)
    Re, te = lie.se3_compose(Ri, ti, Rc, tc)
    np.testing.assert_allclose(np.asarray(Re), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), 0, atol=1e-5)


def test_sim3_exp_log_roundtrip(rng):
    for _ in range(10):
        xi = (rng.normal(size=7) * 0.4).astype(np.float32)
        s, R, t = lie.exp_sim3(jnp.asarray(xi))
        back = np.asarray(lie.log_sim3(s, R, t))
        np.testing.assert_allclose(back, xi, atol=5e-3)


def test_sim3_compose_apply(rng):
    xi = (rng.normal(size=7) * 0.4).astype(np.float32)
    s, R, t = lie.exp_sim3(jnp.asarray(xi))
    si, Ri, ti = lie.sim3_inverse(s, R, t)
    p = jnp.asarray(rng.normal(size=3).astype(np.float32))
    q = lie.sim3_apply(s, R, t, p)
    back = lie.sim3_apply(si, Ri, ti, q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-5)
