"""MPC-level λ₂-connectivity + CLF constraint family.

The reference's block is present but commented out
(``ConnectivityIMPCCBF.cpp:144-157``, ``:177-192``); its operations layer
is live (``ConnectivityMPCCBFQPOperations.cpp:45-87`` + pred variants
``:112-171``). ConnectivityIMPCCBF(enable_connectivity=True) turns the
intended family on: per horizon step, one λ₂ row when the graph is
well-connected (λ₂ > 0.1) else pairwise CLF rows, lifted through U_basis
like the safety family.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_cbf_tpu.types import State, BIG
from mpc_cbf_tpu.ops.cbf import ConnectivityCBF
from mpc_cbf_tpu.ops.qp import ADMMConfig
from mpc_cbf_tpu.controllers import (
    BezierParams, MPCParams, BezierMPCOperator, IMPCParams, ConnectivityIMPCCBF,
)

MPC = MPCParams()


def _ctrl(N=3, enable=True, dmin=0.5, dmax=4.0, iters=300):
    op = BezierMPCOperator(BezierParams(), MPC, dim=3)
    cbf = ConnectivityCBF(dmin, dmax, jnp.asarray(MPC.v_min),
                          jnp.asarray(MPC.v_max))
    ctrl = ConnectivityIMPCCBF(op, cbf, IMPCParams(), N,
                               solver=ADMMConfig(iters=iters),
                               enable_connectivity=enable)
    return op, cbf, ctrl


def test_conn_row_lift_golden_connected_branch():
    """Well-connected team (λ₂ > 0.1): the λ₂ row at step k must equal
    -(a . U_basis[k]) with ub = b from conn_row, and every CLF row must be
    masked (ConnectivityMPCCBFQPOperations.cpp:45-72)."""
    op, cbf, ctrl = _ctrl()
    H, N = ctrl.impc.cbf_horizon, ctrl.N
    x = jnp.array([0.0, 0.0, 0.0, 0.3, 0.1, 0.0])
    nbrs = jnp.array([[1.5, 0.0, 0, 0, 0, 0],
                      [0.0, 1.5, 0, 0, 0, 0],
                      [-1.5, 0.5, 0, 0, 0, 0]])
    mask = jnp.ones(N, bool)
    cur = State(pos=x[:3], vel=x[3:])
    pred = jnp.stack([x, x + 0.05])
    active = jnp.ones(H, bool)

    A_d, lb_d, ub_d = ctrl.dynamic_rows(cur, nbrs, mask, pred, active)
    assert A_d.shape[0] == ctrl.m_cbf + H * (1 + N)

    team = jnp.concatenate([x[None], nbrs])
    lam2, eigvec = cbf.lambda2(team[:, :2])
    assert float(lam2) > ctrl.LAMBDA2_THRESHOLD
    U = np.asarray(op.U_basis)
    for k in range(H):
        team_k = team.at[0].set(pred[k])
        a_c, b_c = cbf.conn_row(pred[k], team_k, eigvec, lam2 - cbf.epsilon, 0)
        row_ref = -(np.asarray(a_c) @ U[k * 3:(k + 1) * 3])
        got = np.asarray(A_d[ctrl.m_cbf + k, :op.n_dec])
        np.testing.assert_allclose(got, row_ref, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(float(ub_d[ctrl.m_cbf + k]), float(b_c),
                                   rtol=1e-12)
    # CLF rows all masked on the connected branch
    clf_ub = np.asarray(ub_d[ctrl.m_cbf + H:])
    assert np.all(clf_ub >= BIG / 2)


def test_clf_row_lift_golden_disconnected_branch():
    """Poorly-connected team (λ₂ ≤ 0.1): per-neighbor CLF rows
    +(a . U_basis[k]) with ub = -b — the CBF-only generator's (correct)
    sign (ConnectivityQPGenerator.cpp:47-55); the reference's MPC-level
    clfConstraint negates a, which is a sign bug in never-executed code
    (see ConnectivityIMPCCBF._extra_rows docstring). λ₂ row masked."""
    op, cbf, ctrl = _ctrl()
    H, N = ctrl.impc.cbf_horizon, ctrl.N
    x = jnp.array([0.0, 0.0, 0.0, 0.3, 0.0, 0.0])
    # neighbors beyond dmax = 4: adjacency to ego is 0 -> disconnected
    nbrs = jnp.array([[5.0, 0.0, 0, 0, 0, 0],
                      [0.0, 5.5, 0, 0, 0, 0],
                      [-6.0, 0.5, 0, 0, 0, 0]])
    mask = jnp.ones(N, bool)
    cur = State(pos=x[:3], vel=x[3:])
    pred = jnp.stack([x, x + 0.02])
    active = jnp.ones(H, bool)

    A_d, lb_d, ub_d = ctrl.dynamic_rows(cur, nbrs, mask, pred, active)
    team = jnp.concatenate([x[None], nbrs])
    lam2, _ = cbf.lambda2(team[:, :2])
    assert float(lam2) <= ctrl.LAMBDA2_THRESHOLD
    # λ₂ rows masked
    assert np.all(np.asarray(ub_d[ctrl.m_cbf:ctrl.m_cbf + H]) >= BIG / 2)
    U = np.asarray(op.U_basis)
    for k in range(H):
        for j in range(N):
            a, b = cbf.clf_row(pred[k], nbrs[j])
            row_ref = np.asarray(a) @ U[k * 3:(k + 1) * 3]
            i = ctrl.m_cbf + H + k * N + j
            np.testing.assert_allclose(np.asarray(A_d[i, :op.n_dec]), row_ref,
                                       rtol=1e-12, atol=1e-12)
            np.testing.assert_allclose(float(ub_d[i]), -float(b), rtol=1e-12)


def test_disabled_flag_keeps_reference_row_count():
    """enable_connectivity=False (the reference's shipped behavior) must
    leave the dynamic block exactly as before: safety rows only."""
    op, cbf, ctrl = _ctrl(enable=False)
    assert ctrl.m_extra == 0
    assert ctrl.m_dynamic == ctrl.m_cbf


def test_lambda2_mask_deflation_matches_subteam():
    """lambda2(positions, node_mask) must equal lambda2 of the dense
    subteam (fixed-shape masking, no reference counterpart)."""
    _, cbf, _ = _ctrl()
    pos5 = jnp.array([[0.0, 0.0], [2.0, 0.5], [0.5, 2.0], [9.0, 9.0], [-7.0, 3.0]])
    mask = jnp.array([True, True, True, False, False])
    lam_masked, vec_masked = cbf.lambda2(pos5, mask)
    lam_sub, vec_sub = cbf.lambda2(pos5[:3])
    np.testing.assert_allclose(float(lam_masked), float(lam_sub), rtol=1e-10)
    a, b = np.asarray(vec_masked[:3]), np.asarray(vec_sub)
    a = a / np.linalg.norm(a)
    assert min(np.abs(a - b).max(), np.abs(a + b).max()) < 1e-8
    # ghost entries carry ~no weight
    assert np.abs(np.asarray(vec_masked[3:])).max() < 1e-6


def test_closed_loop_team_keeps_lambda2_above_epsilon():
    """3 robots in a line, end robots pulled outward past the comm range:
    without the connectivity family the graph disconnects (λ₂ -> 0); with
    it the team stays connected and settles back above ε (measured: end
    positions ±3.1 m instead of the ±5 m goals — the barrier holds the
    formation; transient dips slightly below ε are expected from the
    discrete-time replan + the λ₂<0.1 CLF handoff)."""
    from mpc_cbf_tpu.parallel import MultiAgentSim

    starts = jnp.array([[-2.5, 0.0, 0.0], [0.0, 0.1, 0.0], [2.5, 0.0, 0.0]])
    goals = jnp.array([[-5.0, 0.0, 0.0], [0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    steps = 40

    lam_min = {}
    lam_end = {}
    endx = {}
    for enable in (False, True):
        op, cbf, ctrl = _ctrl(N=2, enable=enable, iters=400)
        sim = MultiAgentSim(ctrl, 3)
        res = sim.rollout(State(pos=starts, vel=jnp.zeros((3, 3))), goals, steps)
        traj = np.asarray(res.traj_pos)  # [T, A, 3]
        lams = [float(cbf.lambda2(jnp.asarray(traj[t, :, :2]))[0])
                for t in range(traj.shape[0])]
        lam_min[enable] = min(lams)
        lam_end[enable] = lams[-1]
        endx[enable] = traj[-1, :, 0]

    # baseline: the unconstrained team actually disconnects en route
    assert lam_end[False] < 0.01, lam_end
    # constrained: never near-disconnected, settles above epsilon, and the
    # outer robots are held well short of the disconnecting goals
    assert lam_min[True] > 0.05, (lam_min, lam_end)
    assert lam_end[True] > cbf.epsilon, (lam_min, lam_end)
    assert abs(endx[True][0]) < 4.0 and abs(endx[True][2]) < 4.0, endx
