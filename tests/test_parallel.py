"""Parallel runtime tests: vmapped rollouts and mesh-sharded scenarios."""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_cbf_tpu.types import State
from mpc_cbf_tpu.ops.cbf import ConnectivityCBF
from mpc_cbf_tpu.ops.qp import ADMMConfig
from mpc_cbf_tpu.controllers import (
    BezierParams, MPCParams, BezierMPCOperator, IMPCParams, ConnectivityIMPCCBF,
)
from mpc_cbf_tpu.parallel import MultiAgentSim, sharded_rollout, make_mesh
from mpc_cbf_tpu.utils.instances import circle_swap_instance


def _sim(num_agents=2, iters=120):
    mpc = MPCParams()
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    cbf = ConnectivityCBF(0.8, 4.0, jnp.asarray(mpc.v_min), jnp.asarray(mpc.v_max))
    ctrl = ConnectivityIMPCCBF(op, cbf, IMPCParams(impc_iter=1), num_agents - 1,
                               solver=ADMMConfig(iters=iters))
    return MultiAgentSim(ctrl, num_agents)


def test_rollout_scan_runs_and_moves_to_goal():
    sim = _sim()
    init = State(pos=jnp.array([[-1.5, 0.0, 0.0], [1.5, 0.0, 0.0]]),
                 vel=jnp.zeros((2, 3)))
    goals = jnp.array([[-1.5, 2.0, 0.0], [1.5, 2.0, 0.0]])  # parallel moves
    res = sim.rollout(init, goals, 35)
    assert res.traj_pos.shape == (35, 2, 3)
    err = np.linalg.norm(np.asarray(res.states.pos - goals)[:, :2], axis=-1)
    assert err.max() < 0.15, err


def test_rollout_failure_reported_and_finite():
    """With an absurdly low iteration budget no solve converges: every
    step must be REPORTED failed, and the fallback path (flying the
    minimal-violation ADMM compromise — safer than the reference's
    fly-the-stale-curve, see IMPCResult.coeffs) must stay finite and
    respect the flown-curve kinematics (no teleports)."""
    sim = _sim(iters=1)
    init = State(pos=jnp.array([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]),
                 vel=jnp.zeros((2, 3)))
    goals = -init.pos
    res = sim.rollout(init, goals, 3)
    assert not bool(res.success.any())
    traj = np.asarray(res.traj_pos)
    assert np.all(np.isfinite(traj))
    # single-period displacement bounded by curve kinematics (no teleports)
    steps = np.diff(np.concatenate([np.asarray(init.pos)[None], traj]), axis=0)
    assert np.abs(steps).max() < 2.0, steps


def test_sharded_rollout_over_scenarios():
    """8 scenarios sharded over the 8-device virtual mesh; results must
    match the unsharded per-scenario rollouts."""
    sim = _sim()
    mesh = make_mesh()  # all 8 devices on the scenario axis
    S = 8
    rng = np.random.default_rng(0)
    base = np.array([[-1.5, 0.0, 0.0], [1.5, 0.0, 0.0]])
    inits = np.stack([base + rng.normal(0, 0.05, base.shape) for _ in range(S)])
    goals = np.stack([-b for b in inits])
    init_state = State(pos=jnp.asarray(inits), vel=jnp.zeros((S, 2, 3)))
    res = sharded_rollout(sim, mesh, init_state, jnp.asarray(goals), 5)
    assert res.traj_pos.shape == (S, 5, 2, 3)
    assert bool(jnp.all(jnp.isfinite(res.traj_pos)))

    # parity with a single-scenario rollout
    res0 = sim.rollout(State(pos=jnp.asarray(inits[0]), vel=jnp.zeros((2, 3))),
                       jnp.asarray(goals[0]), 5, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(res.traj_pos[0]), np.asarray(res0.traj_pos), atol=1e-8
    )


def test_fov_sim_variant():
    from mpc_cbf_tpu.ops.cbf import FovCBF
    from mpc_cbf_tpu.controllers import FovIMPCCBF
    mpc = MPCParams()
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    cbf = FovCBF(2.0944, 0.8, 10.0, mpc.v_min, mpc.v_max)
    ctrl = FovIMPCCBF(op, cbf, IMPCParams(impc_iter=1), max_neighbors=1,
                      box_half_extents=[0.1, 0.1, 0.0], solver=ADMMConfig(iters=120))
    sim = MultiAgentSim(ctrl, num_agents=2)
    init = State(pos=jnp.array([[-1.5, 0.3, 0.0], [1.5, -0.3, 0.0]]),
                 vel=jnp.zeros((2, 3)))
    goals = jnp.stack([init.pos[1], init.pos[0]])
    res = sim.rollout(init, goals, 10)
    assert bool(jnp.all(jnp.isfinite(res.traj_pos)))
    # no collision closer than safety distance minus discretization slack
    d = np.linalg.norm(np.asarray(res.traj_pos[:, 0, :2] - res.traj_pos[:, 1, :2]), axis=-1)
    assert d.min() > 0.6, d.min()


def test_global_mesh_and_host_scenarios():
    """Single-process check of the multi-host helpers: scenario-major
    global mesh + host-local batch assembly into a global sharded array."""
    from mpc_cbf_tpu.parallel.distributed import (
        global_mesh, host_scenarios_to_global, init_distributed,
    )

    init_distributed()  # no-op single process
    mesh = global_mesh(agent=2)
    assert mesh.devices.shape == (4, 2)

    batch = {"pos": np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
    g = host_scenarios_to_global(mesh, batch)
    assert g["pos"].shape == (8, 3)
    np.testing.assert_allclose(np.asarray(g["pos"]), batch["pos"])
    # sharded over the scenario axis of the mesh
    assert len(g["pos"].sharding.device_set) == 8


def test_scenario_axis_collective_free():
    """The scenario-sharded flagship control step must compile with ZERO
    cross-device collectives at 8 devices — the property that makes weak
    scaling linear by construction on real chips (scripts/weak_scaling.py;
    wall-clock scaling on the 2-core virtual mesh only measures host
    oversubscription, so the communication-free HLO is the evidence the
    framework controls)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from weak_scaling import build_sharded_step, count_collectives

    compiled, args = build_sharded_step(n_dev=8, total_batch=16)
    hlo = compiled.as_text()
    assert count_collectives(hlo) == 0, "scenario axis emitted collectives"
    out = compiled(*args)
    assert bool(jnp.all(jnp.isfinite(out[0])))
