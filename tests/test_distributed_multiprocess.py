"""True multi-PROCESS distributed test (SURVEY §5.8; the reference has no
distributed runtime at all).

Launches 2 jax.distributed CPU processes (4 virtual devices each, one
8-device global mesh), runs the scenario-sharded closed loop through the
production path (host_scenarios_to_global + sharded_rollout), and asserts
the reassembled trajectories match a single-process run of the same
scenarios exactly. This exercises the real cross-process code path
(make_array_from_process_local_data over a multi-process mesh) that the
virtual-device tests cannot."""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same scenarios, same rollout, on this process's virtual mesh."""
    from mpc_cbf_tpu.types import State
    from mpc_cbf_tpu.ops.cbf import ConnectivityCBF
    from mpc_cbf_tpu.ops.qp import ADMMConfig
    from mpc_cbf_tpu.controllers import (
        BezierParams, MPCParams, BezierMPCOperator, IMPCParams,
        ConnectivityIMPCCBF,
    )
    from mpc_cbf_tpu.parallel import MultiAgentSim, make_mesh, sharded_rollout

    # the same deterministic scenario set distributed_worker.scenarios()
    # generates (kept inline — importing the worker would run its main body)
    starts, goals = [], []
    for s in range(8):
        off = 0.1 * s
        starts.append([[-1.5, off, 0.0], [1.5, -off, 0.0]])
        goals.append([[1.5, 0.0, 0.0], [-1.5, 0.0, 0.0]])
    starts = jnp.asarray(np.asarray(starts, np.float64))
    goals = jnp.asarray(np.asarray(goals, np.float64))

    mpc = MPCParams()
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    cbf = ConnectivityCBF(0.8, 4.0, jnp.asarray(mpc.v_min), jnp.asarray(mpc.v_max))
    ctrl = ConnectivityIMPCCBF(op, cbf, IMPCParams(),
                               1, solver=ADMMConfig(iters=100))
    sim = MultiAgentSim(ctrl, 2)
    mesh = make_mesh(scenario=8, agent=1)
    res = sharded_rollout(sim, mesh, State(pos=starts, vel=jnp.zeros_like(starts)),
                          goals, 5)
    return np.asarray(res.traj_pos)  # [8, T, A, 3]


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a virtual CPU mesh")
def test_two_process_rollout_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    outs = [tmp_path / f"w{i}.npz" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", str(port), str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(REPO))
        for i in range(2)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            logs.append(out.decode(errors="replace"))
        for i, p in enumerate(procs):
            assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    ref = _single_process_reference()
    got = np.full_like(ref, np.nan)
    for o in outs:
        d = np.load(o)
        pos = 0
        for off, size in zip(d["offsets"], d["sizes"]):
            got[off:off + size] = d["data"][pos:pos + size]
            pos += size
    assert np.isfinite(got).all(), "missing scenario shards"
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)
