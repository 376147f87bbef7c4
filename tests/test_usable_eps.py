"""USABLE_PRI_EPS quantification: flying near-feasible iterates must
never cost physical safety.

The reference flies only CPLEX-OPTIMAL curves
(``MPCCBFFormationControl_example.cpp:150-164``). The fixed-iteration
ADMM instead flies iterates within USABLE_PRI_EPS (= 0.05 scaled row
units) of feasibility. The full sweep over every baseline instance
(``scripts/usable_eps_sweep.py``, eps in {0, 0.01, 0.05}) quantifies the
effect on min-separation / goal error; this test pins the safety
property on a contact-rich rotation where the solver budget is tight
enough that the eps band is actually exercised.
"""
import numpy as np
import jax.numpy as jnp

from mpc_cbf_tpu.types import State
from mpc_cbf_tpu.ops.cbf import ConnectivityCBF
from mpc_cbf_tpu.ops.qp import ADMMConfig
from mpc_cbf_tpu.controllers import (
    BezierParams, MPCParams, BezierMPCOperator, IMPCParams, ConnectivityIMPCCBF,
)
from mpc_cbf_tpu.parallel import MultiAgentSim

D_MIN = 0.8


def _rollout(eps, iters=60, A=4, steps=40):
    mpc = MPCParams()
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    cbf = ConnectivityCBF(D_MIN, 4.0, jnp.asarray(mpc.v_min),
                          jnp.asarray(mpc.v_max))
    ctrl = ConnectivityIMPCCBF(op, cbf, IMPCParams(), A - 1,
                               solver=ADMMConfig(iters=iters))
    ctrl.USABLE_PRI_EPS = float(eps)
    sim = MultiAgentSim(ctrl, A)
    ang = 2 * np.pi * np.arange(A) / A
    base = np.stack([2.0 * np.cos(ang), 2.0 * np.sin(ang), np.zeros(A)], -1)
    init = State(pos=jnp.asarray(base, jnp.float32),
                 vel=jnp.zeros((A, 3), jnp.float32))
    goals = jnp.asarray(np.roll(base, -1, axis=0), jnp.float32)
    res = sim.rollout(init, goals, steps)
    traj = np.asarray(res.traj_pos)                     # [T, A, 3]
    d = np.linalg.norm(traj[:, :, None, :2] - traj[:, None, :, :2], axis=-1)
    iu = np.triu_indices(A, 1)
    return res, float(d[:, iu[0], iu[1]].min())


def test_eps_band_preserves_separation():
    """At the production eps = 0.05 (class default), flown near-feasible
    iterates keep every pairwise separation above the CBF safety
    distance (no slack columns in this variant, so the ONLY source of
    violation would be the eps band itself)."""
    res, min_sep = _rollout(eps=0.05)
    assert np.all(np.isfinite(np.asarray(res.traj_pos)))
    # some solves must actually have used the band for this test to bite:
    # at 60 iters the rotation's close passes leave lanes short of the
    # strict ADMM bar yet flown (success=True)
    assert bool(np.asarray(res.success).any())
    assert min_sep >= D_MIN, min_sep


def test_eps_zero_no_worse_separation():
    """eps = 0 (fly only strictly-converged iterates; failures fall back
    to the last successful curve, reference semantics) must also keep
    separation — and the production eps must not lose more than 5% of
    its separation margin vs the strict setting (quantified bound; the
    full distributional report is scripts/usable_eps_sweep.py)."""
    _, sep_strict = _rollout(eps=0.0)
    _, sep_prod = _rollout(eps=0.05)
    assert sep_strict >= D_MIN
    assert sep_prod >= 0.95 * sep_strict, (sep_prod, sep_strict)
