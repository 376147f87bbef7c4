"""Bézier MPC and iterative MPC-CBF controller tests.

Behavioral oracles mirror the reference CI (SURVEY.md §4): goal reaching
within tolerance and no pairwise collision, plus exactness of the assembled
QP against scipy SLSQP.
"""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize

from mpc_cbf_tpu.types import State
from mpc_cbf_tpu.ops.cbf import FovCBF, ConnectivityCBF
from mpc_cbf_tpu.ops.qp import ADMMConfig
from mpc_cbf_tpu.controllers import (
    BezierParams, MPCParams, BezierMPCOperator, BezierMPC,
    IMPCParams, FovIMPCCBF, ConnectivityIMPCCBF,
)

BEZ = BezierParams()  # base_config.json defaults
MPC = MPCParams()
FOV120 = 2.0943951023931953


def _op():
    return BezierMPCOperator(BEZ, MPC, dim=3)


def test_operator_shapes():
    op = _op()
    assert op.n_dec == 36
    assert op.U_basis.shape == (48, 36)
    assert op.Phi.shape == (48, 36)
    assert op.cont_rows.shape == (2 * 3 * 3, 36)
    # Phi maps ctrl points -> predicted positions; constant-position curve
    # with zero accel must predict constant position offset from x0 drift.
    z = np.tile(np.repeat([1.0, 2.0, 0.5], 4), 3)
    acc = op.U_basis @ z
    np.testing.assert_allclose(acc, 0.0, atol=1e-9)


def test_param_validation():
    import pytest
    with pytest.raises(ValueError):
        MPCParams(Ts=0.2, h=0.1).validate(BEZ)
    with pytest.raises(ValueError):
        MPCParams(spd_f=20).validate(BEZ)
    with pytest.raises(ValueError):
        MPCParams(k_hor=40).validate(BEZ)  # horizon beyond curve span


def test_bezier_mpc_matches_scipy():
    op = _op()
    ctrl = BezierMPC(op, solver=ADMMConfig(iters=600))
    current = State(pos=jnp.array([0.0, 0.0, 0.0]), vel=jnp.zeros(3))
    goal = jnp.array([2.0, 1.0, 0.0])
    ref = jnp.tile(goal, MPC.k_hor)
    qp = ctrl.assemble(current, ref)
    z, sol = ctrl.plan(current, ref)
    assert bool(sol.converged)

    P, q, A, lb, ub = (np.asarray(v) for v in (qp.P, qp.q, qp.A, qp.lb, qp.ub))
    cons = []
    for i in range(A.shape[0]):
        if abs(ub[i] - lb[i]) < 1e-12:
            cons.append({"type": "eq", "fun": lambda zz, i=i: (A @ zz)[i] - lb[i]})
        else:
            if lb[i] > -1e19:
                cons.append({"type": "ineq", "fun": lambda zz, i=i: (A @ zz)[i] - lb[i]})
            if ub[i] < 1e19:
                cons.append({"type": "ineq", "fun": lambda zz, i=i: ub[i] - (A @ zz)[i]})
    refsol = minimize(lambda zz: 0.5 * zz @ P @ zz + q @ zz, np.zeros(36),
                      jac=lambda zz: P @ zz + q, constraints=cons, method="SLSQP",
                      options={"maxiter": 2000, "ftol": 1e-14})
    assert refsol.success
    np.testing.assert_allclose(np.asarray(z), refsol.x, atol=2e-4)


def test_bezier_mpc_goal_reaching_sim():
    """Closed-loop: replan at h, fly the curve for h, reach the goal
    (BezierMPCXYYaw example semantics)."""
    op = _op()
    ctrl = BezierMPC(op, solver=ADMMConfig(iters=300))
    goal = jnp.array([1.5, -1.0, 0.5])
    ref = jnp.tile(goal, MPC.k_hor)
    state = State(pos=jnp.zeros(3), vel=jnp.zeros(3))
    eval_t = float(op.ts_samples[-1] + MPC.Ts)  # advance a full h each step

    warm = None
    for _ in range(30):  # 3 seconds
        z, sol = ctrl.plan(state, ref, warm=warm)
        warm = (z, sol.y)
        pos = op.eval_solution(z, [eval_t], 0)[0]
        vel = op.eval_solution(z, [eval_t], 1)[0]
        state = State(pos=pos, vel=vel)
    np.testing.assert_allclose(np.asarray(state.pos), np.asarray(goal), atol=5e-2)
    # curve start must match the state it was planned from (eq constraint)
    start = op.eval_solution(z, [0.0], 0)[0]
    assert np.linalg.norm(np.asarray(start - pos)) < 1.0


def test_fov_impc_cbf_runs_and_respects_constraints():
    op = _op()
    cbf = FovCBF(FOV120, safety_dist=1.0, max_dist=10.0,
                 vmin=MPC.v_min, vmax=MPC.v_max)
    impc = IMPCParams(cbf_horizon=2, impc_iter=2)
    ctrl = FovIMPCCBF(op, cbf, impc, max_neighbors=2,
                      box_half_extents=[0.1, 0.1, 0.0],
                      solver=ADMMConfig(iters=300))
    current = State(pos=jnp.zeros(3), vel=jnp.array([1.0, 0.0, 0.0]))
    goal = jnp.array([4.0, 0.0, 0.0])
    ref = jnp.tile(goal, MPC.k_hor)
    nbr_xy = jnp.array([[2.5, 0.4], [8.0, 8.0]])
    covs = jnp.tile(0.01 * jnp.eye(2), (2, 1, 1))
    blob = FovIMPCCBF.pack_neighbors(nbr_xy, covs)
    mask = jnp.array([True, False])

    res = ctrl.optimize(current, ref, blob, mask)
    assert res.coeffs.shape == (36,)
    assert bool(res.success)
    # initial condition equality holds
    start_pos = op.eval_solution(res.coeffs, [0.0], 0)[0]
    np.testing.assert_allclose(np.asarray(start_pos), np.asarray(current.pos), atol=1e-4)
    # acceleration bounds hold at samples
    acc = np.asarray(op.U_basis) @ np.asarray(res.coeffs)
    assert np.all(acc.reshape(-1, 3) <= np.asarray(MPC.a_max) + 1e-3)
    assert np.all(acc.reshape(-1, 3) >= np.asarray(MPC.a_min) - 1e-3)


def test_connectivity_impc_cbf_two_agent_swap_no_collision():
    """2 robots swap positions; pairwise-safety MPC-CBF must keep them
    farther apart than d_min at every step (collision_check.py semantics)."""
    op = _op()
    d_min = 0.8
    cbf = ConnectivityCBF(d_min, 4.0, jnp.asarray(MPC.v_min), jnp.asarray(MPC.v_max))
    impc = IMPCParams(cbf_horizon=2, impc_iter=2)
    ctrl = ConnectivityIMPCCBF(op, cbf, impc, max_neighbors=1,
                               solver=ADMMConfig(iters=300))

    from mpc_cbf_tpu.parallel import MultiAgentSim

    starts = jnp.array([[-1.5, 0.02, 0.0], [1.5, -0.02, 0.0]])
    goals = jnp.array([[1.5, 0.0, 0.0], [-1.5, 0.0, 0.0]])
    sim = MultiAgentSim(ctrl, 2)
    res = sim.rollout(State(pos=starts, vel=jnp.zeros((2, 3))), goals, 45)
    traj = np.asarray(res.traj_pos)
    d = np.linalg.norm(traj[:, 0, :2] - traj[:, 1, :2], axis=-1)
    assert d.min() > d_min - 0.05, f"robots collided: min dist {d.min()}"
    # both made progress toward their goals
    assert traj[-1, 0, 0] > 0.5, traj[-1]
    assert traj[-1, 1, 0] < -0.5, traj[-1]


def test_fov_impc_slack_mode():
    """Slack mode: infeasibly tight CBF constraints become soft; the solve
    stays feasible with positive slack on the binding neighbor
    (MPCCBFQPGeneratorBase slack plumbing)."""
    op = _op()
    cbf = FovCBF(FOV120, safety_dist=1.0, max_dist=10.0,
                 vmin=MPC.v_min, vmax=MPC.v_max)
    impc = IMPCParams(cbf_horizon=2, impc_iter=2, slack_mode=True,
                      slack_cost=50000.0, slack_decay_rate=0.1)
    # slack-weighted costs (5e4 linear terms) need a longer dual tail, and
    # the per-row primal bar (1e-5 absolute in f64) another 2x on top
    ctrl = FovIMPCCBF(op, cbf, impc, max_neighbors=2,
                      box_half_extents=[0.05, 0.05, 0.0],
                      solver=ADMMConfig(iters=3000))
    assert ctrl.n == 36 + 2
    # ego flying fast straight at a close neighbor: hard problem is near
    # infeasible; slack must absorb it
    current = State(pos=jnp.zeros(3), vel=jnp.array([2.0, 0.0, 0.0]))
    goal = jnp.array([5.0, 0.0, 0.0])
    ref = jnp.tile(goal, MPC.k_hor)
    nbr_xy = jnp.array([[1.2, 0.0], [6.0, 6.0]])
    covs = jnp.tile(0.01 * jnp.eye(2), (2, 1, 1))
    blob = FovIMPCCBF.pack_neighbors(nbr_xy, covs)
    res = ctrl.optimize(current, ref, blob, jnp.array([True, True]))
    assert bool(res.success)
    assert np.all(np.isfinite(np.asarray(res.coeffs)))


def test_connectivity_cbf_qp_slack_mode():
    from mpc_cbf_tpu.controllers import ConnectivityCBFController
    cbf = ConnectivityCBF(1.0, 3.0, jnp.asarray(MPC.v_min), jnp.asarray(MPC.v_max))
    ctrl = ConnectivityCBFController(cbf, num_robots=3, slack_mode=True,
                                     solver=ADMMConfig(iters=400))
    assert ctrl.n == 3 + 3
    states = jnp.array(
        [[0.0, 0.0, 0, 2.0, 0, 0], [0.9, 0.0, 0, -2.0, 0, 0], [0.0, 1.2, 0, 0, 0, 0]]
    )
    res = ctrl.control(states, jnp.asarray(0), jnp.array([2.0, 0.0, 0.0]))
    assert bool(jnp.all(jnp.isfinite(res.u)))
    # the closing pair's slack should be engaged (nonnegative, finite)
    assert float(jnp.min(res.slack)) >= -1e-6
