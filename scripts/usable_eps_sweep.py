"""Quantify USABLE_PRI_EPS (the fly-a-near-feasible-iterate band).

The reference flies only CPLEX-OPTIMAL curves
(``MPCCBFFormationControl_example.cpp:150-164``); the fixed-iteration
batched ADMM instead returns near-feasible iterates, and
``_IMPCCBFBase.USABLE_PRI_EPS`` decides how much constraint violation
(in scaled row units) an iterate may carry and still be flown. This
sweep runs every baseline instance (``configs/baseline/{2r..8r}``) at
eps in {0, 0.01, 0.05} for both MPC-CBF controller families and reports,
per (instance, controller, eps):

  success / makespan, solver success rate, fraction of steps flown from
  the eps-band (usable but not strictly converged), and the rollout's
  MINIMUM pairwise separation vs the safety distance.

Usage: python scripts/usable_eps_sweep.py [--steps 60] [--out /tmp/eps.jsonl]
"""
from mpc_cbf_tpu.utils.runtime import force_platform  # noqa: E402

import argparse
import glob
import json
import os

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--platform", default="cpu")
    p.add_argument("--controllers", nargs="+",
                   default=["connectivity", "fov"])
    p.add_argument("--eps", type=float, nargs="+", default=[0.0, 0.01, 0.05])
    p.add_argument("--out", default="/tmp/usable_eps.jsonl")
    args = p.parse_args()
    if args.platform:
        force_platform(args.platform)

    import jax.numpy as jnp

    from mpc_cbf_tpu.types import State
    from mpc_cbf_tpu.apps.run_sim import build_sim
    from mpc_cbf_tpu.utils import config as cfgmod

    base = cfgmod.load_config("configs/base_config.json")
    rows = []
    for task_path in sorted(glob.glob("configs/baseline/*/rotate.json")):
        task = json.load(open(task_path))
        so = np.asarray(task["tasks"]["so"], float)
        sf = np.asarray(task["tasks"]["sf"], float)
        R = so.shape[0]
        name = os.path.relpath(task_path, "configs/baseline")
        for controller in args.controllers:
            for eps in args.eps:
                sim, mpc = build_sim(base, controller, R, 200)
                sim.controller.USABLE_PRI_EPS = float(eps)
                init = State(
                    pos=jnp.asarray(np.column_stack([so[:, :2], so[:, 2]]),
                                    jnp.float32),
                    vel=jnp.zeros((R, 3), jnp.float32))
                goals = jnp.asarray(
                    np.column_stack([sf[:, :2], sf[:, 2]]), jnp.float32)
                res = sim.rollout(init, goals, args.steps)
                traj = np.asarray(res.traj_pos)          # [T, R, 3]
                d = np.linalg.norm(
                    traj[:, :, None, :2] - traj[:, None, :, :2], axis=-1)
                iu = np.triu_indices(R, 1)
                min_sep = float(d[:, iu[0], iu[1]].min()) if R > 1 else np.inf
                ok = bool(np.all(np.isfinite(traj)))
                goal_err = float(np.linalg.norm(
                    traj[-1, :, :2] - np.asarray(sf)[:, :2], axis=-1).max())
                rows.append({
                    "instance": name, "controller": controller,
                    "eps": eps, "num_robots": R,
                    "min_separation": round(min_sep, 4),
                    "finite": ok, "final_goal_err": round(goal_err, 3),
                    "solver_success_rate": round(
                        float(np.asarray(res.success, np.float32).mean()), 4),
                })
                print(json.dumps(rows[-1]), flush=True)

    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
