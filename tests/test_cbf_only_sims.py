"""Closed-loop tests for the CBF-only and MPC-only sim layers.

Behavioral oracles as in the reference CI (SURVEY.md §4): goal reach +
no pairwise collision on small instances.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_cbf_tpu.types import State
from mpc_cbf_tpu.ops.cbf import FovCBF, ConnectivityCBF
from mpc_cbf_tpu.ops.qp import ADMMConfig
from mpc_cbf_tpu.controllers import (
    BezierParams, MPCParams, BezierMPCOperator, BezierMPC,
    FovCBFController, ConnectivityCBFController,
)
from mpc_cbf_tpu.parallel import CBFOnlySim, BezierMPCSim

MPC = MPCParams()


def _min_pairwise(traj_pos: np.ndarray) -> float:
    T, A = traj_pos.shape[:2]
    d = traj_pos[:, :, None, :2] - traj_pos[:, None, :, :2]
    dist = np.linalg.norm(d, axis=-1) + np.eye(A) * 1e9
    return float(dist.min())


def test_cbf_connectivity_closed_loop_reaches_goals():
    """Cyclic rotation on a circle — feasible for a CBF-QP (an antipodal
    swap deadlocks on the face-to-face safety barrier, by design)."""
    R = 3
    cbf = ConnectivityCBF(0.8, 10.0, jnp.asarray(MPC.v_min), jnp.asarray(MPC.v_max))
    ctrl = ConnectivityCBFController(cbf, R, solver=ADMMConfig(iters=300))
    sim = CBFOnlySim(ctrl, R, dt=0.1)
    ang = 2 * np.pi * np.arange(R) / R
    so = np.stack([2 * np.cos(ang), 2 * np.sin(ang), np.zeros(R)], axis=-1)
    sf = np.roll(so, -1, axis=0)
    res = sim.rollout(State(pos=jnp.asarray(so), vel=jnp.zeros((R, 3))),
                      jnp.asarray(sf), 80)
    traj = np.asarray(res.traj_pos)
    assert np.asarray(res.success).mean() > 0.95
    assert _min_pairwise(traj) > 0.8
    final_err = np.linalg.norm(traj[-1, :, :2] - sf[:, :2], axis=-1)
    assert final_err.max() < 0.5, final_err


def test_cbf_fov_closed_loop_safety():
    """Two agents crossing with 360-deg FOV (borders disabled): safety
    barrier must keep them Ds apart while the spring drives to goals."""
    R = 2
    cbf = FovCBF(2 * np.pi, 0.5, 20.0, jnp.asarray(MPC.v_min), jnp.asarray(MPC.v_max))
    ctrl = FovCBFController(cbf, R - 1, u_min=MPC.a_min, u_max=MPC.a_max,
                            solver=ADMMConfig(iters=300))
    sim = CBFOnlySim(ctrl, R, dt=0.1)
    so = np.array([[0.0, 0.05, 0.0], [4.0, -0.05, 0.0]])
    sf = np.array([[4.0, 0.05, 0.0], [0.0, -0.05, 0.0]])
    res = sim.rollout(State(pos=jnp.asarray(so), vel=jnp.zeros((R, 3))),
                      jnp.asarray(sf), 100)
    traj = np.asarray(res.traj_pos)
    assert np.asarray(res.success).mean() > 0.9
    assert _min_pairwise(traj) > 0.5
    final_err = np.linalg.norm(traj[-1, :, :2] - sf[:, :2], axis=-1)
    assert final_err.max() < 0.6, final_err


def test_cbf_fov_pf_estimator_tracks():
    """PF-in-the-loop (CBFControl_example parity): per-pair particle
    filters feed the controller; estimates stay finite and track the true
    neighbor inside the FOV."""
    R = 2
    cbf = FovCBF(2 * np.pi, 0.5, 20.0, jnp.asarray(MPC.v_min), jnp.asarray(MPC.v_max))
    ctrl = FovCBFController(cbf, R - 1, u_min=MPC.a_min, u_max=MPC.a_max,
                            solver=ADMMConfig(iters=200))
    sim = CBFOnlySim(ctrl, R, dt=0.1, use_pf=True)
    so = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
    sf = np.array([[3.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    res = sim.rollout(State(pos=jnp.asarray(so), vel=jnp.zeros((R, 3))),
                      jnp.asarray(sf), 30, key=jax.random.PRNGKey(1))
    est = np.asarray(res.est_mean)          # [T, A, 1, 2]
    assert np.all(np.isfinite(est))
    traj = np.asarray(res.traj_pos)
    # agent 0's estimate of agent 1 in the last steps: visible (360 deg FOV,
    # within range), so the PF mean must be near the true position
    err = np.linalg.norm(est[-5:, 0, 0] - traj[-5:, 1, :2], axis=-1)
    assert err.max() < 0.5, err


def test_bezier_mpc_sim_two_agents():
    R = 2
    op = BezierMPCOperator(BezierParams(), MPC, dim=3)
    ctrl = BezierMPC(op, R - 1, box_half_extents=[0.3, 0.3, 0.0],
                     solver=ADMMConfig(iters=200))
    sim = BezierMPCSim(ctrl, R)
    so = np.array([[0.0, 0.6, 0.0], [4.0, -0.6, 0.0]])
    sf = np.array([[4.0, 0.6, 0.0], [0.0, -0.6, 0.0]])
    res = sim.rollout(State(pos=jnp.asarray(so), vel=jnp.zeros((R, 3))),
                      jnp.asarray(sf), 60)
    traj = np.asarray(res.traj_pos)
    assert np.asarray(res.success).all()
    assert _min_pairwise(traj) > 0.6  # Voronoi + bbox shift keeps them apart
    final_err = np.linalg.norm(traj[-1, :, :2] - sf[:, :2], axis=-1)
    assert final_err.max() < 0.3, final_err


def test_yaw_wraparound_does_not_stall_fov():
    """Goal yaw 2pi-equivalent but numerically far (the rotate instances
    hit this): the sim must command the short way around
    (convertToClosestYaw semantics) so FOV barriers don't deadlock."""
    from mpc_cbf_tpu.controllers import (
        BezierMPCOperator, IMPCParams, FovIMPCCBF,
    )
    from mpc_cbf_tpu.parallel import MultiAgentSim

    mpc = MPCParams()
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    cbf = FovCBF(2 * np.pi, 0.3, 20.0, jnp.asarray(mpc.v_min),
                 jnp.asarray(mpc.v_max))
    ctrl = FovIMPCCBF(op, cbf, IMPCParams(), 1, solver=ADMMConfig(iters=200))
    sim = MultiAgentSim(ctrl, 2)
    # yaw 5.5 with goal yaw 0.2: naive tracking spins -5.3 rad; closest
    # equivalent is +0.98 rad (0.2 + 2pi = 6.48)
    so = np.array([[0.0, 1.0, 5.5], [4.0, -1.0, 5.5]])
    sf = np.array([[4.0, 1.0, 0.2], [0.0, -1.0, 0.2]])
    res = sim.rollout(State(pos=jnp.asarray(so), vel=jnp.zeros((2, 3))),
                      jnp.asarray(sf), 50)
    traj = np.asarray(res.traj_pos)
    # reached goals in xy AND in yaw (mod 2pi) without the long spin
    err = np.linalg.norm(traj[-1, :, :2] - sf[:, :2], axis=-1)
    assert err.max() < 0.4, err
    yaw_err = np.abs((traj[-1, :, 2] - sf[:, 2] + np.pi) % (2 * np.pi) - np.pi)
    assert yaw_err.max() < 0.3, traj[-1, :, 2]
    # and the yaw never went below ~5.3 - margin toward the long route
    assert traj[:, :, 2].min() > 4.0
