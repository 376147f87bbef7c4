"""Bernstein basis / Bézier operator tests vs closed forms and finite diffs."""
import numpy as np

from mpc_cbf_tpu.ops import bernstein as bz


def _bezier_eval(cps, T, t):
    """de Casteljau reference evaluation."""
    pts = list(cps)
    s = t / T
    while len(pts) > 1:
        pts = [(1 - s) * a + s * b for a, b in zip(pts[:-1], pts[1:])]
    return pts[0]


def test_basis_row_degree0_derivative():
    row = bz.bernstein_basis_row(3, 2.0, 0.7, 0)
    cps = np.array([0.3, -1.2, 2.0, 0.5])
    np.testing.assert_allclose(row @ cps, _bezier_eval(cps, 2.0, 0.7), atol=1e-12)
    # partition of unity
    np.testing.assert_allclose(np.sum(row), 1.0, atol=1e-12)


def test_basis_row_first_derivative_finite_diff():
    cps = np.array([0.3, -1.2, 2.0, 0.5, 1.1])
    T, t, eps = 1.5, 0.6, 1e-6
    row1 = bz.bernstein_basis_row(4, T, t, 1)
    fd = (_bezier_eval(cps, T, t + eps) - _bezier_eval(cps, T, t - eps)) / (2 * eps)
    np.testing.assert_allclose(row1 @ cps, fd, rtol=1e-6)


def test_basis_row_second_derivative_finite_diff():
    cps = np.array([0.0, 1.0, -1.0, 2.0])
    T, t, eps = 0.5, 0.2, 1e-5
    row2 = bz.bernstein_basis_row(3, T, t, 2)
    fd = (
        _bezier_eval(cps, T, t + eps) - 2 * _bezier_eval(cps, T, t) + _bezier_eval(cps, T, t - eps)
    ) / eps**2
    np.testing.assert_allclose(row2 @ cps, fd, rtol=1e-4)


def test_coefficient_matrix_consistent_with_basis():
    """[1, t, t^2, ...] @ M.T must reproduce the basis row."""
    deg, T, r = 3, 0.5, 1
    M = bz.bernstein_coefficient_matrix(deg, T, r)
    for t in [0.0, 0.1, 0.33, 0.5]:
        mono = np.array([t**j for j in range(deg + 1)])
        np.testing.assert_allclose(M @ mono, bz.bernstein_basis_row(deg, T, t, r), atol=1e-10)


def test_gram_matches_numerical_integral():
    P, T, r = 4, 0.5, 2
    G = bz.integrated_squared_derivative_gram(P, T, r)
    rng = np.random.default_rng(1)
    c = rng.normal(size=P)
    ts = np.linspace(0, T, 20001)
    vals = np.array([bz.bernstein_basis_row(P - 1, T, t, r) @ c for t in ts])
    integral = np.trapezoid(vals**2, ts)
    np.testing.assert_allclose(c @ G @ c, integral, rtol=1e-6)


def test_derivative_control_points():
    """Derivative control-point rows must match the derivative basis."""
    P, T, r = 4, 0.5, 1
    D = bz.derivative_control_point_rows(P, T, r)  # [P-1, P]
    rng = np.random.default_rng(2)
    c = rng.normal(size=P)
    dc = D @ c  # control points of derivative curve (degree P-2)
    for t in [0.0, 0.2, 0.5]:
        lhs = bz.bernstein_basis_row(P - 2, T, t, 0) @ dc
        rhs = bz.bernstein_basis_row(P - 1, T, t, 1) @ c
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_piecewise_eval_matrix_and_continuity():
    pw = bz.PiecewiseBezier(num_pieces=3, num_control_points=4, piece_max_parameter=0.5, dim=3)
    assert pw.num_decision_variables == 36
    assert pw.max_parameter == 1.5
    # piece selection semantics (PiecewiseBezierMPCQPOperations.cpp:193-228)
    assert pw.piece_index_and_parameter(0.0) == (0, 0.0)
    assert pw.piece_index_and_parameter(0.5) == (0, 0.5)
    idx, loc = pw.piece_index_and_parameter(0.7)
    assert idx == 1 and abs(loc - 0.2) < 1e-12

    E = pw.eval_matrix([0.0, 0.1, 0.6, 1.5], 0)
    assert E.shape == (12, 36)

    C = pw.continuity_rows(3)
    assert C.shape == (2 * 3 * 3, 36)
    # a curve with all control points equal is C^inf continuous: rows @ z = 0
    z = np.tile(np.repeat(np.array([1.7, -2.0, 0.3]), 4), 3)
    np.testing.assert_allclose(C @ z, 0.0, atol=1e-9)


def test_eval_curve_jnp():
    import jax.numpy as jnp

    pw = bz.PiecewiseBezier(2, 4, 0.5, 2)
    rng = np.random.default_rng(3)
    z = rng.normal(size=pw.num_decision_variables)
    ts = [0.0, 0.25, 0.75, 1.0]
    out = bz.eval_curve(pw, jnp.asarray(z), ts, 0)
    assert out.shape == (4, 2)
    E = pw.eval_matrix(ts, 0)
    np.testing.assert_allclose(np.asarray(out).reshape(-1), E @ z, atol=1e-10)


def test_piecewise_curve_wrapper():
    """SingleParameterPiecewiseCurve migration surface."""
    import jax.numpy as jnp
    from mpc_cbf_tpu.ops.bernstein import PiecewiseBezier, PiecewiseCurve, eval_curve

    pw = PiecewiseBezier(3, 4, 0.5, 3)
    z = jnp.asarray(np.random.default_rng(5).normal(size=pw.num_decision_variables))
    c = PiecewiseCurve(pw, z)
    assert c.max_parameter == 1.5
    np.testing.assert_allclose(
        np.asarray(c.eval(0.7)), np.asarray(eval_curve(pw, z, [0.7]))[0])
    np.testing.assert_allclose(
        np.asarray(c.eval(99.0)), np.asarray(c.eval(1.5)))  # clamped
    assert float(c.max_derivative_magnitude(1)) > 0
