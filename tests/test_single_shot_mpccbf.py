"""Single-shot BezierMPCCBF (reference BezierMPCCBF.cpp) + curve helpers."""
import numpy as np
import jax.numpy as jnp

from mpc_cbf_tpu.types import State
from mpc_cbf_tpu.ops.cbf import FovCBF
from mpc_cbf_tpu.ops.bernstein import PiecewiseBezier, eval_curve, max_derivative_magnitude
from mpc_cbf_tpu.ops.qp import ADMMConfig
from mpc_cbf_tpu.controllers import (
    BezierParams, MPCParams, BezierMPCOperator, BezierMPCCBF,
)

FOV120 = 2.0943951023931953


def _controller(n_neighbors=1):
    op = BezierMPCOperator(BezierParams(), MPCParams(), dim=3)
    cbf = FovCBF(FOV120, 0.3, 10.0, jnp.asarray(MPCParams().v_min),
                 jnp.asarray(MPCParams().v_max))
    return op, BezierMPCCBF(op, cbf, n_neighbors, solver=ADMMConfig(iters=400))


def test_single_shot_solves_and_respects_safety():
    op, ctrl = _controller()
    cur = State(pos=jnp.array([0.0, 0.0, 0.0]), vel=jnp.zeros(3))
    goal = jnp.array([2.0, 0.0, 0.0])
    ref = jnp.tile(goal, op.mpc.k_hor)
    # neighbor directly on the path, 1.2 m ahead
    blob = jnp.array([[1.2, 0.0]])
    res = ctrl.optimize(cur, ref, blob, jnp.ones(1, bool))
    assert bool(res.success)
    # acceleration at step 0 must satisfy the safety row a.u <= b
    a, b = ctrl.cbf.safety_row(jnp.concatenate([cur.pos, cur.vel]), blob[0])
    u0 = ctrl.derivative_control_inputs(res.coeffs, 2)[:3]
    assert float(a @ u0) <= float(b) + 1e-4


def test_single_shot_has_no_voronoi_rows():
    op, ctrl = _controller(n_neighbors=2)
    assert ctrl.m_extra == 0
    assert ctrl.m_dynamic == ctrl.m_cbf == 3 * 1 * 2  # families * horizon * N
    assert ctrl.S == 0  # no slack in the single-shot variant


def test_derivative_control_inputs_shape():
    op, ctrl = _controller()
    z = jnp.asarray(np.random.default_rng(0).normal(size=op.n_dec))
    u = ctrl.derivative_control_inputs(z, 2)
    assert u.shape == (len(op.ts_samples) * 3,)


def test_max_derivative_magnitude_matches_dense_scan():
    pw = PiecewiseBezier(3, 4, 0.5, 3)
    z = jnp.asarray(np.random.default_rng(2).normal(size=pw.num_decision_variables))
    got = float(max_derivative_magnitude(pw, z, 1, step=0.01))
    ts = np.arange(0.0, pw.max_parameter + 0.005, 0.01)
    ts[-1] = min(ts[-1], pw.max_parameter)
    ref = np.asarray(eval_curve(pw, z, list(ts), 1))
    expect = float(np.max(np.linalg.norm(ref, axis=-1)))
    np.testing.assert_allclose(got, expect, rtol=1e-12)
