"""Per-control-step latency vs the reference real-time budget.

The reference's implied budget: one replan (impc_iter=2 QP solves) per
robot per h = 100 ms on CPU (base_config.json:3). This measures the full
control step (CBF assembly + 2 fused-ADMM solves) for whole TEAMS in
lockstep and reports p50/p95/p99 wall latency.

Usage: python benchmarks/latency.py [team_size] [num_teams]
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mpc_cbf_tpu.types import State
    from mpc_cbf_tpu.ops.cbf import ConnectivityCBF
    from mpc_cbf_tpu.ops.qp.structured import StructuredConfig
    from mpc_cbf_tpu.controllers import (
        BezierParams, MPCParams, BezierMPCOperator, IMPCParams,
        ConnectivityIMPCCBF, StructuredIMPC,
    )
    from mpc_cbf_tpu.utils.profiling import StepTimer

    A = int(sys.argv[1]) if len(sys.argv) > 1 else 8     # robots per team
    teams = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    mpc = MPCParams()
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    cbf = ConnectivityCBF(1.0, 4.0, jnp.asarray(mpc.v_min), jnp.asarray(mpc.v_max))
    ctrl = ConnectivityIMPCCBF(op, cbf, IMPCParams(), A - 1)
    simpc = StructuredIMPC(ctrl, StructuredConfig(iters=200))

    B = A * teams
    rng = np.random.default_rng(0)
    ang = 2 * np.pi * np.arange(A) / A
    base = np.stack([3 * np.cos(ang), 3 * np.sin(ang), np.zeros(A)], -1)
    pos = np.tile(base, (teams, 1)) + rng.normal(0, 0.05, (B, 3))
    cur = State(pos=jnp.asarray(pos, jnp.float32),
                vel=jnp.zeros((B, 3), jnp.float32))
    goals = jnp.asarray(np.tile(np.roll(base, -1, 0), (teams, 1)), jnp.float32)
    ref = jnp.tile(goals, (1, mpc.k_hor))
    # neighbors within the team
    blob = np.zeros((B, A - 1, 6), np.float32)
    for t in range(teams):
        for i in range(A):
            others = [t * A + j for j in range(A) if j != i]
            blob[t * A + i, :, :3] = pos[others]
    blob = jnp.asarray(blob)
    mask = jnp.ones((B, A - 1), bool)

    step = jax.jit(lambda c, r, b, m: simpc.optimize_batch(c, r, b, m).coeffs)
    jax.block_until_ready(step(cur, ref, blob, mask))  # compile

    timer = StepTimer()
    for _ in range(50):
        with timer.measure():
            jax.block_until_ready(step(cur, ref, blob, mask))
    s = timer.stats()
    s.update({"metric": "control_step_latency", "team_size": A,
              "teams": teams, "budget_ms": mpc.h * 1e3,
              "within_budget_p99": s["p99_ms"] <= mpc.h * 1e3})
    print(json.dumps(s))


if __name__ == "__main__":
    main()
