"""Lie-group math tests: round trips, composition, reference-chart parity.

Pattern: synthetic known-transform checks, as in the reference's
``ransac/ransac_test.cpp:84-205`` and octave oracles (``octave/*.m``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g2o_frontend_tpu.utils import lie


rng = np.random.default_rng(0)


def random_rotation():
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class TestSE2:
    def test_v2t_t2v_roundtrip(self):
        v = jnp.array([1.0, -2.0, 0.7])
        np.testing.assert_allclose(lie.se2_t2v(lie.se2_v2t(v)), v, atol=1e-6)

    def test_compose_matches_matrix(self):
        a = jnp.array([1.0, 2.0, 0.3])
        b = jnp.array([-0.5, 0.1, -1.2])
        got = lie.se2_compose(a, b)
        want = lie.se2_t2v(lie.se2_v2t(a) @ lie.se2_v2t(b))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_inverse(self):
        a = jnp.array([1.0, 2.0, 0.3])
        ident = lie.se2_compose(a, lie.se2_inverse(a))
        np.testing.assert_allclose(ident, jnp.zeros(3), atol=1e-6)

    def test_relative(self):
        a = jnp.array([1.0, 2.0, 0.3])
        b = jnp.array([-0.5, 0.1, -1.2])
        got = lie.se2_relative(a, b)
        want = lie.se2_compose(lie.se2_inverse(a), b)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_apply(self):
        a = jnp.array([1.0, 2.0, np.pi / 2])
        p = jnp.array([[1.0, 0.0]])
        np.testing.assert_allclose(
            lie.se2_apply(a, p), jnp.array([[1.0, 3.0]]), atol=1e-6
        )


class TestSE3QuatChart:
    """Parity with the reference chart (basemath/bm_se3.h:8-51)."""

    def test_quat2mat_identity(self):
        np.testing.assert_allclose(
            lie.quat2mat(jnp.zeros(3)), jnp.eye(3), atol=1e-7
        )

    @pytest.mark.parametrize("seed", range(5))
    def test_mat2quat_quat2mat_roundtrip(self, seed):
        R = jnp.asarray(random_rotation(), jnp.float32)
        q = lie.mat2quat(R)
        np.testing.assert_allclose(lie.quat2mat(q), R, atol=1e-5)

    def test_v2t_t2v_roundtrip(self):
        v = jnp.array([1.0, -2.0, 3.0, 0.1, -0.2, 0.3])
        np.testing.assert_allclose(lie.se3_t2v(lie.se3_v2t(v)), v, atol=1e-6)

    def test_t2v_v2t_roundtrip_through_matrix(self):
        R = jnp.asarray(random_rotation(), jnp.float32)
        T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
        v = lie.se3_t2v(T)
        np.testing.assert_allclose(lie.se3_v2t(v), T, atol=1e-5)


class TestSE3Twist:
    def test_exp_log_roundtrip(self):
        xi = jnp.array([0.5, -0.3, 0.2, 0.1, 0.4, -0.2])
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-5)

    def test_exp_zero(self):
        np.testing.assert_allclose(lie.se3_exp(jnp.zeros(6)), jnp.eye(4), atol=1e-7)

    def test_log_small_angle(self):
        xi = jnp.array([1e-5, 2e-5, -1e-5, 1e-6, -2e-6, 1e-6])
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-8)

    def test_exp_log_large_rotation(self):
        w = jnp.array([0.0, 0.0, 3.0])  # near pi
        xi = jnp.concatenate([jnp.array([1.0, 0.0, 0.0]), w])
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-3)

    def test_inverse(self):
        xi = jnp.array([0.5, -0.3, 0.2, 0.1, 0.4, -0.2])
        T = lie.se3_exp(xi)
        np.testing.assert_allclose(lie.se3_inverse(T) @ T, jnp.eye(4), atol=1e-6)

    def test_vmappable(self):
        xis = jnp.asarray(rng.normal(size=(16, 6)) * 0.3, jnp.float32)
        Ts = jax.vmap(lie.se3_exp)(xis)
        back = jax.vmap(lie.se3_log)(Ts)
        np.testing.assert_allclose(back, xis, atol=1e-4)


class TestQuaternion:
    def test_quat_rotate_matches_matrix(self):
        q = np.asarray(rng.normal(size=4))
        q /= np.linalg.norm(q)
        p = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        qj = jnp.asarray(q, jnp.float32)
        R = lie.quat2mat(jnp.where(qj[0] < 0, -qj, qj)[1:])
        np.testing.assert_allclose(lie.quat_rotate(qj, p), p @ R.T, atol=1e-5)

    def test_quat_mul_identity(self):
        q = jnp.array([0.5, 0.5, 0.5, 0.5])
        e = jnp.array([1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(lie.quat_mul(e, q), q, atol=1e-7)
