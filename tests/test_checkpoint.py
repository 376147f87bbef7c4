"""Checkpoint/resume tests (SURVEY §5.4 — new capability, absent upstream)."""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_cbf_tpu.types import State
from mpc_cbf_tpu.utils.checkpoint import Checkpointer, checkpointed_rollout
from mpc_cbf_tpu.ops.cbf import ConnectivityCBF
from mpc_cbf_tpu.ops.qp import ADMMConfig
from mpc_cbf_tpu.controllers import (
    BezierParams, MPCParams, BezierMPCOperator, IMPCParams, ConnectivityIMPCCBF,
)
from mpc_cbf_tpu.parallel import MultiAgentSim


def test_checkpointer_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path), keep=2)
    tree = {"a": jnp.arange(4.0), "b": (jnp.ones((2, 2)), jnp.asarray(3))}
    ck.save(10, tree)
    ck.save(20, jax.tree.map(lambda x: x * 2, tree))
    ck.save(30, jax.tree.map(lambda x: x * 3, tree))
    assert ck.steps() == [20, 30]  # keep=2 garbage-collects the oldest
    step, restored = ck.restore_latest(tree)
    assert step == 30
    np.testing.assert_allclose(np.asarray(restored["a"]),
                               3 * np.arange(4.0))


def _sim():
    mpc = MPCParams()
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    cbf = ConnectivityCBF(1.0, 4.0, jnp.asarray(mpc.v_min), jnp.asarray(mpc.v_max))
    ctrl = ConnectivityIMPCCBF(op, cbf, IMPCParams(), 1,
                               solver=ADMMConfig(iters=120))
    return MultiAgentSim(ctrl, 2)


def test_checkpointed_rollout_resumes(tmp_path):
    sim = _sim()
    init = State(pos=jnp.array([[-1.5, 0.3, 0.0], [1.5, -0.3, 0.0]]),
                 vel=jnp.zeros((2, 3)))
    goals = jnp.array([[1.5, 0.3, 0.0], [-1.5, -0.3, 0.0]])
    key = jax.random.PRNGKey(0)

    ck = Checkpointer(str(tmp_path))
    (tp, tv, sc), final = checkpointed_rollout(sim, init, goals, 20, key,
                                               ck, every=8)
    assert tp.shape[0] == 20
    assert ck.steps()[-1] == 20

    # "crash" and resume: a fresh call continues from step 20 to 30
    (tp2, _, _), final2 = checkpointed_rollout(sim, init, goals, 30, key,
                                               ck, every=8)
    assert tp2.shape[0] == 10  # only the remaining 10 steps were run
    assert ck.steps()[-1] == 30
