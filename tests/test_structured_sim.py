"""Structured (fused-Pallas-path) MultiAgentSim vs the dense path."""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_cbf_tpu.types import State
from mpc_cbf_tpu.ops.cbf import ConnectivityCBF
from mpc_cbf_tpu.ops.qp import ADMMConfig
from mpc_cbf_tpu.controllers import (
    BezierParams, MPCParams, BezierMPCOperator, IMPCParams, ConnectivityIMPCCBF,
)
from mpc_cbf_tpu.parallel import MultiAgentSim
from mpc_cbf_tpu.utils.instances import circle_rotate_instance


def test_structured_sim_matches_dense_behavior():
    mpc = MPCParams()
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    cbf = ConnectivityCBF(1.0, 4.0, jnp.asarray(mpc.v_min), jnp.asarray(mpc.v_max))
    ctrl = ConnectivityIMPCCBF(op, cbf, IMPCParams(), 3,
                               solver=ADMMConfig(iters=200))
    inst = circle_rotate_instance(4, radius=2.5)
    so = np.asarray(inst["tasks"]["so"], np.float32)
    sf = np.asarray(inst["tasks"]["sf"], np.float32)
    init = State(pos=jnp.asarray(so), vel=jnp.zeros((4, 3), jnp.float32))
    goals = jnp.asarray(sf)

    res_d = MultiAgentSim(ctrl, 4, structured=False).rollout(init, goals, 40)
    res_s = MultiAgentSim(ctrl, 4, structured=True).rollout(init, goals, 40)

    for res in (res_d, res_s):
        traj = np.asarray(res.traj_pos)
        err = np.linalg.norm(traj[-1, :, :2] - sf[:, :2], axis=-1)
        assert err.max() < 0.5, err
        d = traj[:, :, None, :2] - traj[:, None, :, :2]
        dist = np.linalg.norm(d, axis=-1) + np.eye(4) * 1e9
        assert dist.min() > 1.0
        assert np.asarray(res.success).mean() > 0.9
