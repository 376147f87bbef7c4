"""Scenario-axis scaling demonstration on the virtual CPU mesh.

BASELINE.json asks for solves/s scaling at 1 chip / 1 host / >=2 hosts.
Real multi-chip hardware is not reachable from this environment (one v5e
chip via the axon tunnel), so this measures the next-best evidence on
the 8-virtual-device CPU mesh: that the scenario axis is genuinely
collective-free, i.e. sharding the SAME total batch across 1/2/4/8
devices leaves wall time ~flat (no communication, no resharding, no
SPMD overhead). On real chips — where each device brings its own
compute — zero sharding overhead is exactly what makes weak scaling
near-linear (SURVEY.md §5.8: the scenario axis is embarrassingly
parallel; DCN only crosses hosts on this axis).

NOTE a fixed-PER-DEVICE batch ("weak scaling" proper) is NOT meaningful
on a virtual mesh: the host has 2 physical cores, so 8 virtual devices
share compute and per-device-constant batch just measures host
oversubscription, not the framework. Fixed-TOTAL-batch overhead is the
property the framework controls.

Usage: python scripts/weak_scaling.py [total_batch] [reps]
Emits one JSON line per device count + a summary line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    total_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    sys.path.insert(0, "/root/repo")
    from mpc_cbf_tpu.utils.runtime import force_platform
    force_platform("cpu", host_device_count=8)

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mpc_cbf_tpu.types import State
    from mpc_cbf_tpu.ops.cbf import FovCBF
    from mpc_cbf_tpu.ops.qp.structured import StructuredConfig
    from mpc_cbf_tpu.controllers import (
        BezierParams, MPCParams, BezierMPCOperator, IMPCParams, FovIMPCCBF)
    from mpc_cbf_tpu.controllers.mpc_cbf import StructuredIMPC

    mpc = MPCParams()
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    impc = IMPCParams(slack_mode=True)
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    beta = 120.0 * np.pi / 180.0
    cbf = FovCBF(beta, 0.3, 6.0, jnp.asarray(mpc.v_min), jnp.asarray(mpc.v_max))
    N = 7
    ctrl = FovIMPCCBF(op, cbf, impc, N,
                      box_half_extents=np.array([0.1, 0.1, 0.0]))
    simpc = StructuredIMPC(ctrl, StructuredConfig(iters=200, iters_tail=64))

    B = total_batch
    ang = rng.uniform(0, 2 * np.pi, (B, N))
    rad = rng.uniform(1.0, 3.5, (B, N))
    cov = np.broadcast_to(np.array([0.05, 0.0, 0.05]), (B, N, 3))
    nbr = np.concatenate([
        (rad * np.cos(ang))[..., None], (rad * np.sin(ang))[..., None],
        cov], axis=-1).astype(np.float32)
    pos = rng.normal(0, 0.3, (B, 3)).astype(np.float32)
    vel = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
    goals = rng.normal(0, 3.0, (B, 3)).astype(np.float32)
    ref_np = np.tile(goals[:, None, :], (1, mpc.k_hor, 1)).reshape(B, -1)

    results = {}
    for n_dev in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("scenario",))
        sh = NamedSharding(mesh, P("scenario"))
        put = lambda a: jax.device_put(jnp.asarray(a), sh)
        args = (State(pos=put(pos), vel=put(vel)), put(ref_np), put(nbr),
                put(np.ones((B, N), bool)))

        @jax.jit
        def control_batch(cur, ref, blob, mask):
            res = simpc.optimize_batch(cur, ref, blob, mask)
            return res.coeffs, res.success

        out = control_batch(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(control_batch(*args))
        dt = (time.perf_counter() - t0) / reps
        solves = B * impc.impc_iter / dt
        results[n_dev] = dt
        print(json.dumps({
            "devices": n_dev, "total_batch": B, "wall_s": round(dt, 3),
            "solves_per_s": round(solves, 1),
            "overhead_vs_1dev": round(dt / results[1] - 1.0, 4),
        }), flush=True)

    print(json.dumps({
        "metric": "scenario_axis_sharding_overhead",
        "overhead_8dev": round(results[8] / results[1] - 1.0, 4),
        "note": ("fixed-total-batch wall time vs device count; ~0 overhead "
                 "=> collective-free scenario axis => near-linear weak "
                 "scaling on real chips"),
    }), flush=True)


if __name__ == "__main__":
    main()
