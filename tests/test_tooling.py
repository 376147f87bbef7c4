"""Experiment tooling tests: plotting, statistics aggregation, app e2e."""
import json

import numpy as np

from mpc_cbf_tpu.apps.statistics import aggregate, load_rows
from mpc_cbf_tpu.apps.plot_results import load_states, plot_trajectories
from mpc_cbf_tpu.utils.instances import (
    circle_rotate_instance, formation_instance, fov_circle_instance,
)


def _rows():
    rows = []
    for R in (2, 4):
        for s in range(4):
            rows.append({"controller": "connectivity", "num_robots": R,
                         "seed": s, "success": s != 0 or R == 2,
                         "makespan": 40.0 + s if (s != 0 or R == 2)
                         else float("inf")})
    return rows


def test_statistics_aggregate(tmp_path):
    p = tmp_path / "sweep.jsonl"
    with open(p, "w") as f:
        for r in _rows():
            f.write(json.dumps(r) + "\n")
    summary = aggregate(load_rows(str(p)))
    assert len(summary) == 2
    s2 = next(s for s in summary if s["num_robots"] == 2)
    s4 = next(s for s in summary if s["num_robots"] == 4)
    assert s2["success_rate"] == 1.0
    assert s4["success_rate"] == 0.75
    # inf makespans dropped from the CI (ComputeCI inf-robust semantics)
    assert np.isfinite(s4["makespan_mean"])


def test_plot_results_roundtrip(tmp_path):
    # synthetic 2-robot states.json in the app schema
    T, R = 12, 2
    t = np.linspace(0, 1, T)
    states = {}
    for i in range(R):
        pos = np.stack([t * (i + 1), np.full(T, float(i)), np.zeros(T)], -1)
        vel = np.zeros((T, 3))
        states[str(i)] = {
            "states": np.concatenate([pos, vel], -1).tolist(),
            "goal": [float(i + 1), float(i), 0.0],
        }
    p = tmp_path / "states.json"
    with open(p, "w") as f:
        json.dump({"dt": 0.1, "Ts": 0.01, "robots": states}, f)

    traj, goals, _ = load_states(str(p))
    assert traj.shape == (T, R, 3)
    ax = plot_trajectories(traj, goals, edges_dmax=5.0)
    out = tmp_path / "traj.png"
    ax.figure.savefig(str(out))
    assert out.stat().st_size > 1000


def test_instance_generators_shapes():
    for inst, n in ((circle_rotate_instance(5), 5),
                    (formation_instance(6, n_row=2), 6),
                    (fov_circle_instance(4), 4)):
        so = np.asarray(inst["tasks"]["so"])
        sf = np.asarray(inst["tasks"]["sf"])
        assert so.shape == sf.shape == (n, 3)
        assert np.all(np.isfinite(so)) and np.all(np.isfinite(sf))
    # fov instance yaw faces the center
    fv = np.asarray(fov_circle_instance(4)["tasks"]["so"])
    to_center = np.arctan2(-fv[:, 1], -fv[:, 0])
    np.testing.assert_allclose(fv[:, 2], to_center, atol=1e-3)


def test_run_sim_app_end_to_end(tmp_path):
    """The full app path on CPU: smallest instance, short runtime."""
    from mpc_cbf_tpu.apps import run_sim

    task = tmp_path / "task.json"
    with open(task, "w") as f:
        json.dump(circle_rotate_instance(2, radius=2.0), f)
    out = tmp_path / "states.json"
    rc = run_sim.main([
        "--base", "configs/base_config.json", "--task", str(task),
        "--controller", "connectivity", "--sim-runtime", "10.0",
        "--solver-iters", "150", "--out", str(out),
    ])
    assert rc == 0
    d = json.load(open(out))
    assert len(d["robots"]) == 2
    assert len(d["robots"]["0"]["states"]) == 100
