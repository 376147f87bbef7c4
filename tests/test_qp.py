"""Batched ADMM QP solver tests.

Oracles: the reference's analytic solver smoke test (qpcpp
``tests/CPLEXTest.cpp:28-50``: min x^2+y^2 s.t. x+y>=1 -> (0.5, 0.5)),
hand-derivable QPs, and scipy SLSQP on random strictly-convex instances.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from mpc_cbf_tpu.types import QPBatch, BIG
from mpc_cbf_tpu.ops.qp import solve_batch, ADMMConfig, box_rows, pad_rows, stack_qp


def _solve_np(P, q, A, lb, ub, **kw):
    qp = QPBatch(
        P=jnp.asarray(P), q=jnp.asarray(q), A=jnp.asarray(A),
        lb=jnp.asarray(lb), ub=jnp.asarray(ub),
    )
    return solve_batch(qp, ADMMConfig(**kw))


def test_cplex_smoke_qp():
    # min x^2 + y^2 s.t. x + y >= 1  (CPLEXTest.cpp:28-50)
    P = 2 * np.eye(2)
    q = np.zeros(2)
    A = np.array([[1.0, 1.0]])
    sol = _solve_np(P, q, A, [1.0], [BIG], iters=200)
    np.testing.assert_allclose(np.asarray(sol.z), [0.5, 0.5], atol=1e-6)
    assert bool(sol.converged)


def test_equality_constraint():
    # min ||z - c||^2 s.t. z0 + z1 = 1, z2 = -2
    c = np.array([3.0, -1.0, 5.0])
    P = 2 * np.eye(3)
    q = -2 * c
    A = np.array([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    sol = _solve_np(P, q, A, [1.0, -2.0], [1.0, -2.0], iters=200)
    # projection of c onto the affine set: z = c + A'(AA')^{-1}(b - Ac)
    z_exact = np.array([2.5, -1.5, -2.0])
    np.testing.assert_allclose(np.asarray(sol.z), z_exact, atol=1e-6)


def test_box_constraints_via_rows():
    P = 2 * np.eye(2)
    q = np.array([-10.0, 10.0])  # unconstrained opt at (5, -5)
    A, lb, ub = box_rows(2, [-1.0, -1.0], [1.0, 1.0], dtype=jnp.float64)
    sol = _solve_np(P, q, np.asarray(A), np.asarray(lb), np.asarray(ub), iters=200)
    np.testing.assert_allclose(np.asarray(sol.z), [1.0, -1.0], atol=1e-6)


def test_padded_rows_are_inert():
    P = 2 * np.eye(2)
    q = np.zeros(2)
    A = np.array([[1.0, 1.0]])
    A_p, lb_p, ub_p = pad_rows(jnp.asarray(A), jnp.asarray([1.0]), jnp.asarray([BIG]), 16)
    sol = _solve_np(P, q, np.asarray(A_p), np.asarray(lb_p), np.asarray(ub_p), iters=200)
    np.testing.assert_allclose(np.asarray(sol.z), [0.5, 0.5], atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_qp_vs_slsqp(seed):
    rng = np.random.default_rng(seed)
    n, m = 8, 12
    M = rng.normal(size=(n, n))
    P = M @ M.T + n * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    z_feas = rng.normal(size=n) * 0.1
    margin = rng.uniform(0.1, 1.0, size=m)
    lb = A @ z_feas - margin
    ub = A @ z_feas + margin

    sol = _solve_np(P, q, A, lb, ub, iters=400)

    cons = [
        {"type": "ineq", "fun": lambda z, i=i: (A @ z)[i] - lb[i]} for i in range(m)
    ] + [
        {"type": "ineq", "fun": lambda z, i=i: ub[i] - (A @ z)[i]} for i in range(m)
    ]
    ref = minimize(
        lambda z: 0.5 * z @ P @ z + q @ z, z_feas, jac=lambda z: P @ z + q,
        constraints=cons, method="SLSQP", options={"maxiter": 500, "ftol": 1e-12},
    )
    assert ref.success
    np.testing.assert_allclose(np.asarray(sol.z), ref.x, atol=2e-5)


def test_batched_solve_and_warm_start():
    rng = np.random.default_rng(3)
    B, n, m = 16, 6, 10
    Ms = rng.normal(size=(B, n, n))
    P = np.einsum("bij,bkj->bik", Ms, Ms) + n * np.eye(n)
    q = rng.normal(size=(B, n))
    A = rng.normal(size=(B, m, n))
    z0 = rng.normal(size=(B, n)) * 0.1
    margin = rng.uniform(0.2, 1.0, size=(B, m))
    lb = np.einsum("bmn,bn->bm", A, z0) - margin
    ub = np.einsum("bmn,bn->bm", A, z0) + margin

    qp = QPBatch(*(jnp.asarray(v) for v in (P, q, A, lb, ub)))
    sol = solve_batch(qp, ADMMConfig(iters=300))
    assert sol.z.shape == (B, n)
    assert bool(jnp.all(sol.pri_res < 1e-5))

    # warm start from the solution: few iters must keep the answer
    sol2 = solve_batch(qp, ADMMConfig(iters=20), x0=sol.z, y0=sol.y)
    np.testing.assert_allclose(np.asarray(sol2.z), np.asarray(sol.z), atol=1e-5)


def test_stack_qp_helper():
    A1, lb1, ub1 = box_rows(3, [-1] * 3, [1] * 3, dtype=jnp.float64)
    A2 = jnp.ones((1, 3))
    A, lb, ub = stack_qp([(A1, lb1, ub1), (A2, jnp.asarray([0.5]), jnp.asarray([BIG]))])
    assert A.shape == (4, 3) and lb.shape == (4,) and ub.shape == (4,)


def test_mpc_scale_qp_accuracy():
    """A QP at the flagship problem scale (n=36+slack, m~200) solved to
    tight accuracy: long-run f64 ADMM is the ground truth, the production
    iteration count must be within 1e-4 of it."""
    rng = np.random.default_rng(7)
    n, m = 40, 200
    M = rng.normal(size=(n, n))
    P = M @ M.T / n + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n)) / np.sqrt(n)
    z0 = rng.normal(size=n) * 0.1
    lo = A @ z0 - rng.uniform(0.05, 0.5, size=m)
    hi = A @ z0 + rng.uniform(0.05, 0.5, size=m)
    # a few equality rows
    lo[:6] = hi[:6] = (A @ z0)[:6]

    truth = _solve_np(P, q, A, lo, hi, iters=20000)
    prod = _solve_np(P, q, A, lo, hi, iters=400)
    np.testing.assert_allclose(np.asarray(prod.z), np.asarray(truth.z), atol=1e-4)
