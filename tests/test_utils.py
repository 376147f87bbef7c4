"""Metrics / config / instances / geometry / controls tests."""
import json
import numpy as np
import jax
import jax.numpy as jnp

from mpc_cbf_tpu.utils import metrics, instances, config as cfgmod
from mpc_cbf_tpu.ops import geometry as geo
from mpc_cbf_tpu.ops.controls import (
    PIDParams, pid_control, critically_damped_spring_control, add_random_noise,
)
from mpc_cbf_tpu.types import State


# ---- metrics (collision_check.py / Metrics.py / ComputeCI.py parity) -------

def test_instance_success_clean_run():
    T = 10
    t = np.linspace(0, 1, T)
    traj = np.zeros((2, T, 3))
    traj[0, :, 0] = -2 + 2 * t  # ends at 0
    traj[1, :, 0] = 2 - 2 * t
    traj[1, :, 1] = 1.5  # parallel lane, no collision
    goals = np.array([[0.0, 0.0, 0.0], [0.0, 1.5, 0.0]])
    ok, makespan = metrics.instance_success(traj, goals, radius=0.5)
    assert ok and np.isfinite(makespan)


def test_instance_success_detects_collision():
    T = 5
    traj = np.zeros((2, T, 3))
    traj[0, :, 0] = np.linspace(-1, 1, T)
    traj[1, :, 0] = np.linspace(1, -1, T)  # cross at origin
    goals = np.array([[1.0, 0, 0], [-1.0, 0, 0]])
    ok, makespan = metrics.instance_success(traj, goals, radius=0.5,
                                            collision_shape=(0.2, 0.2))
    assert not ok and makespan == float("inf")


def test_instance_success_goal_miss():
    T = 4
    traj = np.zeros((2, T, 3))
    traj[1, :, 1] = 3.0
    goals = np.array([[5.0, 0, 0], [0.0, 3.0, 0]])
    ok, _ = metrics.instance_success(traj, goals, radius=0.5)
    assert not ok


def test_instance_success_ref_collision_only():
    """The reference scorer fails on collision ONLY: its goal-miss
    `return False` is commented out (collision_check.py:56-59)."""
    # goal miss: strict fails, ref passes (makespan = T, never all-reached)
    T = 4
    traj = np.zeros((2, T, 3))
    traj[1, :, 1] = 3.0
    goals = np.array([[5.0, 0, 0], [0.0, 3.0, 0]])
    ok_strict, _ = metrics.instance_success(traj, goals, radius=0.5)
    ok_ref, mk_ref = metrics.instance_success_ref(traj, goals, radius=0.5)
    assert not ok_strict and ok_ref and mk_ref == T

    # collision: both fail (T=5 puts both robots at the origin at t=2)
    traj2 = np.zeros((2, 5, 3))
    traj2[0, :, 0] = np.linspace(-1, 1, 5)
    traj2[1, :, 0] = np.linspace(1, -1, 5)
    goals2 = np.array([[1.0, 0, 0], [-1.0, 0, 0]])
    ok_ref2, mk2 = metrics.instance_success_ref(traj2, goals2, radius=0.5)
    assert not ok_ref2 and mk2 == float("inf")

    # clean goal-reaching run: both pass with the same finite makespan
    t = np.linspace(0, 1, 10)
    traj3 = np.zeros((2, 10, 3))
    traj3[0, :, 0] = -2 + 2 * t
    traj3[1, :, 0] = 2 - 2 * t
    traj3[1, :, 1] = 1.5
    goals3 = np.array([[0.0, 0.0, 0.0], [0.0, 1.5, 0.0]])
    ok_s, mk_s = metrics.instance_success(traj3, goals3, radius=0.5)
    ok_r, mk_r = metrics.instance_success_ref(traj3, goals3, radius=0.5)
    assert ok_s and ok_r and mk_s == mk_r


def test_ci95():
    s = np.random.default_rng(0).normal(5.0, 1.0, size=(3, 400))
    mean, ci = metrics.ci95(s)
    assert np.all(np.abs(mean - 5.0) < 0.2)
    np.testing.assert_allclose(ci, 1.96 / np.sqrt(400), atol=0.02)


def test_ci95_with_inf():
    s = np.array([[1.0, np.inf, 3.0, 2.0], [np.inf, np.inf, np.inf, np.inf]])
    mean, ci = metrics.ci95_with_inf(s)
    np.testing.assert_allclose(mean[0], 2.0)
    assert np.isinf(mean[1])


def test_avg_neighbors_in_fov():
    # two robots facing each other inside range -> each sees the other
    traj = np.zeros((2, 3, 3))
    traj[1, :, 0] = 2.0
    traj[1, :, 2] = np.pi  # facing back toward robot 0
    val = metrics.avg_neighbors_in_fov(traj, fov=2.0, rng=5.0)
    assert val == 2.0  # each of 2 robots sees 1 neighbor -> sum 2 per t


# ---- instances --------------------------------------------------------------

def test_circle_swap_instance_antipodal():
    inst = instances.circle_swap_instance(4, radius=3.0)
    so = np.asarray(inst["tasks"]["so"])
    sf = np.asarray(inst["tasks"]["sf"])
    np.testing.assert_allclose(so[:, :2], -sf[:, :2], atol=1e-9)


def test_random_instance_separation():
    inst = instances.random_instance(5, box=5.0, min_sep=1.5, seed=3)
    so = np.asarray(inst["tasks"]["so"])
    for i in range(5):
        for j in range(i + 1, 5):
            assert np.linalg.norm(so[i, :2] - so[j, :2]) >= 1.5


# ---- config (base_config.json schema parity) --------------------------------

BASE_CFG = {
    "mpc_params": {"h": 0.1, "Ts": 0.01, "k_hor": 16,
                   "mpc_tuning": {"w_pos_err": 10, "w_u_eff": 10, "spd_f": 8}},
    "physical_limits": {
        "p_min": [-5, -5], "p_max": [5, 5],
        "v_min": [-2, -2, -2.62], "v_max": [2, 2, 2.62],
        "a_min": [-5, -5, -3.14], "a_max": [5, 5, 3.14],
        "pos_std": 0.001, "vel_std": 0.01,
    },
    "robot_params": {"collision_shape": {"aligned_box": [0.2, 0.2, 0.0], "radius": 0.5}},
    "cbf_params": {"d_min": 2.0, "d_max": 4.0, "cbf_horizon": 2, "impc_iter": 2,
                   "slack_mode": False, "slack_cost": 50000, "slack_decay_rate": 0.1},
    "bezier_params": {"num_pieces": 3, "num_control_points": 4,
                      "piece_max_parameter": 0.5, "bezier_continuity_upto_degree": 3},
}


def test_config_roundtrip(tmp_path):
    base = tmp_path / "base.json"
    task = tmp_path / "task.json"
    base.write_text(json.dumps(BASE_CFG))
    task.write_text(json.dumps({"tasks": {"so": [[0, 0, 0]], "sf": [[1, 1, 0]]}}))
    cfg = cfgmod.load_config(str(base), str(task))
    mpc = cfgmod.parse_mpc_params(cfg)
    assert mpc.k_hor == 16 and mpc.spd_f == 8
    bez = cfgmod.parse_bezier_params(cfg)
    assert bez.num_pieces == 3
    impc = cfgmod.parse_impc_params(cfg)
    assert impc.impc_iter == 2 and impc.slack_cost == 50000
    d_min, d_max = cfgmod.parse_cbf_distances(cfg)
    assert (d_min, d_max) == (2.0, 4.0)
    shape, typ = cfgmod.parse_collision_shape(cfg)
    assert typ == "box"
    so, sf = cfgmod.parse_tasks(cfg)
    assert so.shape == (1, 3)
    assert cfgmod.parse_noise(cfg) == (0.001, 0.01)


# ---- geometry ---------------------------------------------------------------

def test_voronoi_midpoint_on_plane():
    n, off = geo.voronoi_hyperplane(jnp.array([0.0, 0.0]), jnp.array([2.0, 0.0]))
    # midpoint (1,0): n.x + off == 0
    assert abs(float(n @ jnp.array([1.0, 0.0]) + off)) < 1e-9
    # self side negative
    assert float(n @ jnp.array([0.0, 0.0]) + off) < 0


def test_shift_hyperplane_support():
    n = jnp.array([1.0, 0.0])
    off = jnp.asarray(-1.0)
    new_off = geo.shift_hyperplane_for_box(n, off, jnp.array([0.25, 0.1]))
    np.testing.assert_allclose(float(new_off), -0.75)


def test_eigh_2x2_matches_numpy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        M = rng.normal(size=(2, 2))
        C = M @ M.T
        vals, vecs = geo.eigh_2x2(jnp.asarray(C))
        ref_vals, ref_vecs = np.linalg.eigh(C)
        np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-9)
        # eigenvector up to sign
        for k in range(2):
            v = np.asarray(vecs)[:, k]
            r = ref_vecs[:, k]
            assert min(np.linalg.norm(v - r), np.linalg.norm(v + r)) < 1e-6


def test_distance_to_ellipse_circle_case():
    cov = jnp.eye(2) * (1.0 / geo.CONF_90)  # ellipse radius 1
    d = geo.distance_to_ellipse(jnp.array([3.0, 0.0]), jnp.zeros(2), cov)
    np.testing.assert_allclose(float(d), 2.0, atol=1e-6)
    d_in = geo.distance_to_ellipse(jnp.array([0.2, 0.0]), jnp.zeros(2), cov)
    assert float(d_in) < 0  # inside -> negative


def test_yaw_helpers():
    np.testing.assert_allclose(float(geo.convert_yaw_in_range(jnp.asarray(3.5))),
                               3.5 - 2 * np.pi)
    cy = geo.convert_to_closest_yaw(jnp.asarray(3.0), jnp.asarray(-3.0))
    np.testing.assert_allclose(float(cy), -3.0 + 2 * np.pi)


def test_rotate_roundtrip():
    u = jnp.array([1.0, 2.0, 0.5])
    yaw = jnp.asarray(0.7)
    ub = geo.rotate_control_to_body(u, yaw)
    uw = geo.rotate_control_to_world(ub, yaw)
    np.testing.assert_allclose(np.asarray(uw), np.asarray(u), atol=1e-12)


# ---- controls ---------------------------------------------------------------

def test_pid_and_spring():
    st = State(pos=jnp.zeros(3), vel=jnp.zeros(3))
    u, ie = pid_control(PIDParams(3.0, 0.1, 0.3, 0.1), st, jnp.zeros(3),
                        jnp.ones(3), jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(u), 3.0 + 0.1 * 0.1, atol=1e-12)
    us = critically_damped_spring_control(st, jnp.ones(3), 4.0)
    np.testing.assert_allclose(np.asarray(us), 4.0, atol=1e-12)


def test_add_random_noise_stats():
    st = State(pos=jnp.zeros((1000, 3)), vel=jnp.zeros((1000, 3)))
    noisy = add_random_noise(jax.random.PRNGKey(0), st, 0.1, 0.2)
    assert abs(float(jnp.std(noisy.pos)) - 0.1) < 0.02
    assert abs(float(jnp.std(noisy.vel)) - 0.2) < 0.02


def test_logging_env_level_and_matrix_format(monkeypatch):
    import logging as pylog
    import numpy as np
    from mpc_cbf_tpu.utils.logging import (
        initialize_logging, matrix_to_string, log_matrix, log_vector,
    )

    monkeypatch.setenv("LOG_LEVEL", "debug")
    lg = initialize_logging("t_mcbf")
    assert lg.level == pylog.DEBUG
    s = matrix_to_string(np.array([[1.0, 2.5], [3.0, 4.0]]))
    assert s.splitlines() == ["1 2.5", "3 4"]
    log_matrix(lg, "M", np.eye(2))
    log_vector(lg, "v", np.arange(3.0))
