"""Benchmark: MPC-CBF QP solves/s on the current default device.

Measures the full flagship control path — per-agent QP assembly (autodiff
CBF rows, Voronoi rows, cost contraction) + the iterative IMPC loop
(impc_iter batched ADMM solves) — for a large batch of independent
agent-scenarios in lockstep, i.e. exactly the per-robot work of the
reference's ``ConnectivityIMPCCBF::optimize``
(``MPCCBFFormationControl_example.cpp:140-147``) times batch.

Emits ONE JSON line:
  {"metric": "mpccbf_qp_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N / 10000}
(baseline = the 10k solves/s v5e-8 target in BASELINE.json; this runs on
however many chips are visible — per-chip value is value/num_devices).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mpc_cbf_tpu.types import State
    from mpc_cbf_tpu.ops.cbf import ConnectivityCBF
    from mpc_cbf_tpu.ops.qp import ADMMConfig
    from mpc_cbf_tpu.controllers import (
        BezierParams, MPCParams, BezierMPCOperator, IMPCParams, ConnectivityIMPCCBF,
    )

    from mpc_cbf_tpu.ops.qp.structured import StructuredConfig
    from mpc_cbf_tpu.controllers.mpc_cbf import StructuredIMPC

    num_agents = 4          # neighbors per QP = 3
    impc = IMPCParams()     # impc_iter = 2 QP solves per control step
    solver_iters = 200      # f32 accuracy floor ~1e-4 (see tests/test_qp.py)
    # default batch sized for single-chip throughput saturation (the fused
    # Pallas ADMM keeps scaling past this; 32k x 2 solves ~ 0.14 s/step)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768

    mpc = MPCParams()
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    cbf = ConnectivityCBF(1.0, 4.0, jnp.asarray(mpc.v_min), jnp.asarray(mpc.v_max))
    ctrl = ConnectivityIMPCCBF(
        op, cbf, impc, max_neighbors=num_agents - 1,
        solver=ADMMConfig(iters=solver_iters),
    )
    simpc = StructuredIMPC(ctrl, StructuredConfig(iters=solver_iters))

    rng = np.random.default_rng(0)
    # batch of feasible agent snapshots: ego near origin, neighbors on a
    # 2.5-4 m ring (outside d_min, mix of in/out of connectivity range)
    pos = jnp.asarray(rng.normal(0, 0.3, (batch, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 0.5, (batch, 3)), jnp.float32)
    goals = jnp.asarray(rng.normal(0, 3.0, (batch, 3)), jnp.float32)
    ang = rng.uniform(0, 2 * np.pi, (batch, num_agents - 1))
    rad = rng.uniform(2.5, 4.0, (batch, num_agents - 1))
    nbr_pos = np.stack([rad * np.cos(ang), rad * np.sin(ang),
                        np.zeros_like(rad)], axis=-1)
    nbr_vel = rng.normal(0, 0.5, (batch, num_agents - 1, 3))
    nbr = jnp.asarray(np.concatenate([nbr_pos, nbr_vel], axis=-1), jnp.float32)
    mask = jnp.ones((batch, num_agents - 1), bool)

    @jax.jit
    def control_batch(pos, vel, goals, nbr):
        ref = jnp.tile(goals[:, None, :], (1, mpc.k_hor, 1)).reshape(batch, -1)
        res = simpc.optimize_batch(State(pos=pos, vel=vel), ref, nbr, mask)
        return res.coeffs, res.success

    def run_once():
        out = control_batch(pos, vel, goals, nbr)
        # force a host scalar readback: block_until_ready alone does not
        # actually wait for remote execution through the axon tunnel
        float(jnp.sum(out[0]))

    run_once()  # warmup / compile

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        run_once()
    dt = (time.perf_counter() - t0) / reps

    qp_solves = batch * impc.impc_iter
    solves_per_s = qp_solves / dt
    print(json.dumps({
        "metric": "mpccbf_qp_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
