"""CBF-only controller tests (reference L5 behaviors, FovControl /
ConnectivityControl semantics)."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize

from mpc_cbf_tpu.ops.cbf import FovCBF, ConnectivityCBF
from mpc_cbf_tpu.ops.qp import ADMMConfig
from mpc_cbf_tpu.controllers.cbf_qp import FovCBFController, ConnectivityCBFController

VMIN = [-2.0, -2.0, -2.6179938779914944]
VMAX = [2.0, 2.0, 2.6179938779914944]
FOV120 = 2.0943951023931953


def _scipy_qp(P, q, A, lb, ub, n):
    cons = []
    for i in range(A.shape[0]):
        if lb[i] > -1e19:
            cons.append({"type": "ineq", "fun": lambda z, i=i: (A @ z)[i] - lb[i]})
        if ub[i] < 1e19:
            cons.append({"type": "ineq", "fun": lambda z, i=i: ub[i] - (A @ z)[i]})
    ref = minimize(
        lambda z: 0.5 * z @ P @ z + q @ z, np.zeros(n), jac=lambda z: P @ z + q,
        constraints=cons, method="SLSQP", options={"maxiter": 1000, "ftol": 1e-14},
    )
    assert ref.success, ref.message
    return ref.x


def test_fov_controller_matches_scipy_on_assembled_qp():
    cbf = FovCBF(FOV120, safety_dist=1.0, max_dist=6.0, vmin=VMIN, vmax=VMAX)
    ctrl = FovCBFController(cbf, max_neighbors=2, u_min=[-5, -5, -3.14], u_max=[5, 5, 3.14],
                            solver=ADMMConfig(iters=500))
    state = jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0])
    u_des = jnp.array([2.0, 0.0, 0.0])
    nbr = jnp.array([[2.0, 0.3], [4.0, -1.0]])
    cov = jnp.tile(0.01 * jnp.eye(2), (2, 1, 1))
    mask = jnp.array([True, True])

    qp = ctrl.assemble(state, u_des, nbr, cov, mask)
    res = ctrl.control(state, u_des, nbr, cov, mask)
    z_ref = _scipy_qp(*(np.asarray(v) for v in (qp.P, qp.q, qp.A, qp.lb, qp.ub)), ctrl.n)
    np.testing.assert_allclose(np.asarray(res.u), z_ref[:3], atol=1e-5)
    assert bool(res.converged)


def test_fov_controller_safety_braking():
    """Approaching a close target fast: the CBF must cut the desired
    forward acceleration (TestInitSafetyCBF activation semantics)."""
    cbf = FovCBF(FOV120, safety_dist=1.0, max_dist=6.0, vmin=VMIN, vmax=VMAX)
    ctrl = FovCBFController(cbf, max_neighbors=1, solver=ADMMConfig(iters=400))
    state = jnp.array([0.0, 0.0, 0.0, 1.8, 0.0, 0.0])
    u_des = jnp.array([3.0, 0.0, 0.0])
    nbr = jnp.array([[1.3, 0.0]])
    cov = jnp.tile(0.01 * jnp.eye(2), (1, 1, 1))
    res = ctrl.control(state, u_des, nbr, cov, jnp.array([True]))
    assert float(res.u[0]) < 0.0  # braking, not following u_des


def test_fov_controller_inactive_when_far():
    """No neighbors in range: u == u_des (constraints inactive)."""
    cbf = FovCBF(FOV120, 1.0, 6.0, VMIN, VMAX)
    ctrl = FovCBFController(cbf, max_neighbors=1, solver=ADMMConfig(iters=300))
    state = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    u_des = jnp.array([0.5, -0.2, 0.1])
    nbr = jnp.array([[3.0, 0.0]])
    cov = jnp.tile(0.01 * jnp.eye(2), (1, 1, 1))
    res = ctrl.control(state, u_des, nbr, cov, jnp.array([True]))
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u_des), atol=1e-4)


def test_fov_masked_neighbor_is_inert():
    cbf = FovCBF(FOV120, 1.0, 6.0, VMIN, VMAX)
    ctrl = FovCBFController(cbf, max_neighbors=2, solver=ADMMConfig(iters=300))
    state = jnp.array([0.0, 0.0, 0.0, 1.8, 0.0, 0.0])
    u_des = jnp.array([3.0, 0.0, 0.0])
    cov = jnp.tile(0.01 * jnp.eye(2), (2, 1, 1))
    # close neighbor masked out, far neighbor active -> like no constraint
    nbr = jnp.array([[1.2, 0.0], [5.5, 0.0]])
    res = ctrl.control(state, u_des, nbr, cov, jnp.array([False, True]))
    res_active = ctrl.control(state, u_des, nbr, cov, jnp.array([True, True]))
    assert float(res.u[0]) > float(res_active.u[0])


def test_connectivity_controller_all_agents():
    cbf = ConnectivityCBF(0.8, 3.0, jnp.asarray(VMIN), jnp.asarray(VMAX))
    ctrl = ConnectivityCBFController(cbf, num_robots=3, solver=ADMMConfig(iters=400))
    states = jnp.array(
        [[0.0, 0.0, 0, 0, 0, 0], [1.5, 0.0, 0, 0, 0, 0], [0.0, 1.5, 0, 0, 0, 0]]
    )
    u_des = jnp.array([[0.5, 0.0, 0.0], [0.0, 0.5, 0.0], [-0.5, 0.0, 0.0]])
    res = ctrl.control_all(states, u_des)
    assert res.u.shape == (3, 3)
    assert bool(jnp.all(res.converged))


def test_connectivity_matches_scipy():
    cbf = ConnectivityCBF(0.8, 3.0, jnp.asarray(VMIN), jnp.asarray(VMAX))
    ctrl = ConnectivityCBFController(cbf, num_robots=3, solver=ADMMConfig(iters=600))
    states = jnp.array(
        [[0.0, 0.0, 0, 0.3, 0, 0], [1.2, 0.0, 0, -0.2, 0.1, 0], [0.0, 1.2, 0, 0, -0.1, 0]]
    )
    u_des = jnp.array([1.0, -0.5, 0.2])
    qp = ctrl.assemble(states, 0, u_des)
    res = ctrl.control(states, jnp.asarray(0), u_des)
    z_ref = _scipy_qp(*(np.asarray(v) for v in (qp.P, qp.q, qp.A, qp.lb, qp.ub)), ctrl.n)
    np.testing.assert_allclose(np.asarray(res.u), z_ref[:3], atol=1e-5)


def test_connectivity_clf_branch_when_disconnected():
    """Spread the robots far apart: lambda2 ~ 0 -> CLF rows active, pulling
    agents together (ConnectivityControl.cpp:71-84)."""
    cbf = ConnectivityCBF(0.8, 3.0, jnp.asarray(VMIN), jnp.asarray(VMAX))
    ctrl = ConnectivityCBFController(cbf, num_robots=3, solver=ADMMConfig(iters=400))
    states = jnp.array(
        [[0.0, 0.0, 0, 0, 0, 0], [10.0, 0.0, 0, 0, 0, 0], [0.0, 10.0, 0, 0, 0, 0]]
    )
    lam2, _ = cbf.lambda2(states[:, :2])
    assert float(lam2) < 0.1
    u_des = jnp.zeros(3)
    res = ctrl.control(states, jnp.asarray(0), u_des)
    # CLF demands movement toward the neighbors (positive x and y accel)
    assert float(res.u[0]) > 0.05 and float(res.u[1]) > 0.05


def test_vmap_over_agents_and_scenarios():
    cbf = FovCBF(FOV120, 1.0, 6.0, VMIN, VMAX)
    ctrl = FovCBFController(cbf, max_neighbors=1, solver=ADMMConfig(iters=100))
    S, A = 2, 3
    key = jax.random.PRNGKey(0)
    states = jax.random.normal(key, (S, A, 6))
    u_des = jnp.zeros((S, A, 3))
    nbr = 3.0 + jax.random.normal(key, (S, A, 1, 2))
    cov = jnp.tile(0.01 * jnp.eye(2), (S, A, 1, 1, 1))
    mask = jnp.ones((S, A, 1), dtype=bool)
    ctrl_fn = jax.vmap(jax.vmap(ctrl.control))
    res = ctrl_fn(states, u_des, nbr, cov, mask)
    assert res.u.shape == (S, A, 3)


def test_connectivity_team_eigh_hoisted_once():
    """control_all computes the team eigendecomposition ONCE, outside the
    per-robot vmap (the reference recomputes it per robot call,
    ConnectivityControl.cpp:69 — it is a per-team quantity), and its rows
    match per-robot assembly exactly."""
    from mpc_cbf_tpu.ops.cbf import ConnectivityCBF
    from mpc_cbf_tpu.controllers import ConnectivityCBFController
    from mpc_cbf_tpu.ops.qp import ADMMConfig

    from mpc_cbf_tpu.controllers import MPCParams
    MPC = MPCParams()
    cbf = ConnectivityCBF(1.0, 4.0, jnp.asarray(MPC.v_min), jnp.asarray(MPC.v_max))
    ctrl = ConnectivityCBFController(cbf, num_robots=4,
                                     solver=ADMMConfig(iters=50))
    rng = np.random.default_rng(0)
    states = jnp.asarray(rng.normal(0, 1.5, (4, 6)))
    us = jnp.asarray(rng.normal(0, 0.5, (4, 3)))

    # structural: exactly ONE eigh in the hoisted batched assembly
    def assemble_all(states, us):
        le = cbf.lambda2(states[:, :2])
        return jax.vmap(lambda i, ud: ctrl.assemble(states, i, ud, le))(
            jnp.arange(4), us)

    jaxpr = str(jax.make_jaxpr(assemble_all)(states, us))
    # the primitive prints as "= eigh[..." once per call (its jit
    # wrapper name also contains "eigh", so count the primitive form)
    assert jaxpr.count("= eigh[") == 1, jaxpr.count("= eigh[")

    # rows identical to per-robot (unhoisted) assembly
    qp_h = assemble_all(states, us)
    qp_u = jax.vmap(lambda i, ud: ctrl.assemble(states, i, ud))(
        jnp.arange(4), us)
    # QPBatch is a dataclass pytree (not iterable) — compare its leaves
    for a, b in zip(jax.tree.leaves(qp_h), jax.tree.leaves(qp_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
