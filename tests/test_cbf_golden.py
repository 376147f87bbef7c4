"""Golden-value tests of the autodiff CBF engine.

The expected numbers are the numeric oracles from the reference's GoogleTest
suites (``workspace/lib/cbf/tests/TestInitSafetyCBF.cpp``,
``TestInitConnectivity.cpp``) — fixed states in, exact Ac/Bc out. These pin
the JAX-autodiff pipeline to the GiNaC symbolic pipeline.
"""
import numpy as np
import jax.numpy as jnp

from mpc_cbf_tpu.ops.cbf import ConnectivityCBF, FovCBF

VMIN = -np.ones(3)
VMAX = np.ones(3)


def _conn():
    # TestInitSafetyCBF.cpp fixture: min_dist=0.8, max_dist=2.0
    return ConnectivityCBF(0.8, 2.0, VMIN, VMAX)


class TestConnectivitySafety:
    # generator applies coefficients = -Ac (FovQPGenerator.cpp:17), the
    # golden values below are the raw Ac from the CBF getters.

    def test_two_robot_safe_region(self):
        x = jnp.array([0.0, 0, 0, 0, 0, 0])
        other = jnp.array([1.0, 0, 0, 0, 0, 0])
        a, b = _conn().safety_row(x, other)
        np.testing.assert_allclose(np.asarray(a), [-2.0, 0.0, 0.0], atol=1e-12)
        np.testing.assert_allclose(float(b), 0.06347497291775989, atol=1e-9)

    def test_two_robot_huge_velocity(self):
        x = jnp.array([0.0, 0, 0, 100.0, 100.0, 0])
        other = jnp.array([1.0, 0, 0, 0, 0, 0])
        a, b = _conn().safety_row(x, other)
        np.testing.assert_allclose(np.asarray(a), [-2.0, 0.0, 0.0], atol=1e-12)
        np.testing.assert_allclose(float(b), -39820583.995200224, rtol=1e-12)

    def test_on_safety_bound(self):
        x = jnp.array([0.0, 0, 0, 0, 0, 0])
        other = jnp.array([0.8, 0, 0, 0, 0, 0])
        a, b = _conn().safety_row(x, other)
        np.testing.assert_allclose(np.asarray(a), [-1.6, 0.0, 0.0], atol=1e-12)
        assert abs(float(b)) < 1e-12

    def test_unsafe_region(self):
        x = jnp.array([0.0, 0, 0, 0, 0, 0])
        other = jnp.array([0.5, 0, 0, 0, 0, 0])
        a, b = _conn().safety_row(x, other)
        np.testing.assert_allclose(np.asarray(a), [-1.0, 0.0, 0.0], atol=1e-12)
        np.testing.assert_allclose(float(b), -0.13045522572422458, atol=1e-12)


class TestConnectivityLambda2:
    # TestInitConnectivity.cpp fixture: min_dist=0.8, max_dist=3.0
    def _cbf(self):
        return ConnectivityCBF(0.8, 3.0, VMIN, VMAX)

    def test_misc_line(self):
        cbf = self._cbf()
        states = jnp.array(
            [[1.0, 2.0, 0, 0, 0, 0], [1.0, 4.0, 0, 0, 0, 0], [1.0, 6.0, 0, 0, 0, 0]]
        )
        lam2, vec = cbf.lambda2(states[:, :2])
        h = lam2 - cbf.epsilon
        a, b = cbf.conn_row(states[0], states, vec, h, 0)
        np.testing.assert_allclose(np.asarray(a), [0.0, -2.703392, 0.0], atol=1e-6)
        np.testing.assert_allclose(float(b), 3.4635324630258153, rtol=1e-9)

    def test_misc2(self):
        cbf = self._cbf()
        states = jnp.array(
            [
                [0.212, 1.592, 0, -0.293, -0.21, 0.0],
                [1.01, 4.20, 0, -1.2, 0.12, 0],
                [-1.0, -0.02, 0, -0.2, 0.16, 0],
            ]
        )
        lam2, vec = cbf.lambda2(states[:, :2])
        h = lam2 - cbf.epsilon
        a, b = cbf.conn_row(states[0], states, vec, h, 0)
        np.testing.assert_allclose(np.asarray(a), [0.061292, 0.201971, 0.0], atol=1e-6)
        np.testing.assert_allclose(float(b), -2.2784138163109593, rtol=1e-9)


class TestFov:
    """Semantic checks for the FoV family (the reference has no numeric
    goldens for FovCBF; these check the math invariants its tests rely on)."""

    def _cbf(self, fov=2.0943951023931953):  # 120 deg
        return FovCBF(fov, safety_dist=2.0, max_dist=4.0, vmin=VMIN, vmax=VMAX)

    def test_safety_sign_structure(self):
        cbf = self._cbf()
        x = jnp.array([0.0, 0, 0, 0, 0, 0])
        t = jnp.array([3.0, 0.0])
        a, b = cbf.safety_row(x, t)
        # h = 9 - 4 > 0, stationary: b = alpha(alpha(h)) > 0
        assert float(b) > 0
        # closing fast -> b very negative
        x_fast = jnp.array([0.0, 0, 0, 50.0, 0, 0])
        _, b_fast = cbf.safety_row(x_fast, t)
        assert float(b_fast) < -1e4

    def test_safety_matches_unrotated_form(self):
        """The rotation preserves the norm, so Ac/Bc must equal the
        unrotated-form derivation: a = [-2 dx, -2 dy, 0] at zero yaw."""
        cbf = self._cbf()
        x = jnp.array([0.5, -0.2, 0.7, 0.1, -0.3, 0.05])
        t = jnp.array([3.0, 1.0])
        a, b = cbf.safety_row(x, t)
        dx, dy = 3.0 - 0.5, 1.0 + 0.2
        np.testing.assert_allclose(float(a[0]), -2 * dx, atol=1e-9)
        np.testing.assert_allclose(float(a[1]), -2 * dy, atol=1e-9)
        # theta component: d/dth of L_f h — nonzero in general
        assert np.isfinite(float(a[2]))

    def test_range_is_negated_safety_geometry(self):
        cbf = self._cbf()
        x = jnp.array([0.0, 0, 0, 0.3, 0.1, 0.0])
        t = jnp.array([1.0, 1.0])
        a_s, _ = cbf.safety_row(x, t)
        a_r, _ = cbf.range_row(x, t)
        np.testing.assert_allclose(np.asarray(a_r)[:2], -np.asarray(a_s)[:2], atol=1e-9)

    def test_border_rows_symmetry(self):
        """Target on the centerline: LB and RB rows mirror in the y/omega
        components."""
        cbf = self._cbf()
        x = jnp.array([0.0, 0, 0, 0.5, 0.0, 0.0])
        t = jnp.array([2.0, 0.0])
        a_l, b_l = cbf.lb_row(x, t)
        a_r, b_r = cbf.rb_row(x, t)
        np.testing.assert_allclose(float(b_l), float(b_r), atol=1e-9)
        np.testing.assert_allclose(float(a_l[0]), float(a_r[0]), atol=1e-9)
        np.testing.assert_allclose(float(a_l[1]), -float(a_r[1]), atol=1e-9)

    def test_vel_rows(self):
        cbf = self._cbf()
        x = jnp.array([0.0, 0, 0, 0.5, -0.3, 0.2])
        A, b = cbf.vel_rows(x)
        assert A.shape == (6, 3) and b.shape == (6,)
        np.testing.assert_allclose(np.asarray(b), [0.5, 1.3, 0.8, 1.5, 0.7, 1.2], atol=1e-12)

    def test_fov_360_disables_borders(self):
        cbf = FovCBF(2 * np.pi, 2.0, 4.0, VMIN, VMAX)
        x = jnp.zeros(6)
        t = jnp.array([1.0, 1.0])
        a, b = cbf.lb_row(x, t)
        assert float(b) > 1e19 and np.allclose(np.asarray(a), 0)


class TestCLF:
    def test_clf_at_desired_distance_is_zero(self):
        cbf = ConnectivityCBF(0.8, 2.0, VMIN, VMAX)
        x = jnp.array([0.0, 0, 0, 0, 0, 0])
        other = jnp.array([2.0, 0, 0, 0, 0, 0])  # dist == d_desired == 2
        a, b = cbf.clf_row(x, other)
        assert abs(float(b)) < 1e-9

    def test_clf_gradient_direction(self):
        cbf = ConnectivityCBF(0.8, 2.0, VMIN, VMAX)
        x = jnp.array([0.0, 0, 0, 0, 0, 0])
        other = jnp.array([3.0, 0, 0, 0, 0, 0])  # too far
        a, b = cbf.clf_row(x, other)
        # V = (3-2)^2 = 1, Lf V = 0 (zero vel) -> b = beta2 * V = 2
        np.testing.assert_allclose(float(b), 2.0, atol=1e-9)
        # a = dLfV/dv = grad_p V = 2(dist-d)*dp/dist -> [-2, 0]
        np.testing.assert_allclose(np.asarray(a), [-2.0, 0.0, 0.0], atol=1e-9)
