"""Deployment-layer tests: bus/scheduler determinism + full node graph.

Reference parity: the ROS node graph of workspace/src (control_node +
filter_node + goal/ids nodes vs PX4 SITL), run here as a deterministic
virtual-time simulation.
"""
import numpy as np
import jax.numpy as jnp
from mpc_cbf_tpu.deploy import Bus, Scheduler, launch_formation
from mpc_cbf_tpu.ops.cbf import FovCBF
from mpc_cbf_tpu.ops.qp import ADMMConfig
from mpc_cbf_tpu.controllers import (
    BezierParams, MPCParams, BezierMPCOperator, IMPCParams, FovIMPCCBF,
)


def test_bus_pubsub_and_latch():
    bus = Bus()
    got = []
    bus.publish("a", 1, latch=True)
    bus.subscribe("a", got.append)      # latched delivery on subscribe
    bus.publish("a", 2)
    assert got == [1, 2]


def test_scheduler_orders_timers():
    s = Scheduler()
    seen = []
    s.create_timer(0.10, lambda: seen.append(("slow", round(s.now, 3))))
    s.create_timer(0.05, lambda: seen.append(("fast", round(s.now, 3))))
    s.run_until(0.2)
    assert seen == [("fast", 0.05), ("slow", 0.1), ("fast", 0.1),
                    ("fast", 0.15), ("slow", 0.2), ("fast", 0.2)]
    assert s.now == 0.2


def test_scheduler_cancel():
    s = Scheduler()
    seen = []
    ev = s.create_timer(0.1, lambda: seen.append(1))
    s.cancel(ev)
    s.run_until(1.0)
    assert seen == []


def test_scheduler_cancel_after_firing():
    """cancel() must stop a periodic timer that has already fired
    (ros::Timer::stop parity — the handle stays live across re-pushes)."""
    s = Scheduler()
    seen = []
    ev = s.create_timer(0.1, lambda: seen.append(round(s.now, 3)))
    s.run_until(0.35)
    assert seen == [0.1, 0.2, 0.3]
    s.cancel(ev)
    s.run_until(2.0)
    assert seen == [0.1, 0.2, 0.3]


def test_scheduler_cancel_inside_callback():
    """A timer may cancel itself from its own callback."""
    s = Scheduler()
    seen = []

    def cb():
        seen.append(round(s.now, 3))
        if len(seen) == 2:
            s.cancel(ev)

    ev = s.create_timer(0.1, cb)
    s.run_until(1.0)
    assert seen == [0.1, 0.2]


def test_two_robot_deployment_reaches_goals():
    """Full node graph (SITL plant + PF estimator + controller + goal/ids)
    flies two robots through takeoff -> mission and reaches the goals."""
    mpc = MPCParams()
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    cbf = FovCBF(2 * np.pi, 0.3, 20.0, jnp.asarray(mpc.v_min),
                 jnp.asarray(mpc.v_max))

    def factory(i):
        return FovIMPCCBF(op, cbf, IMPCParams(), max_neighbors=1,
                          solver=ADMMConfig(iters=200))

    starts = np.array([[0.0, 0.7, 0.0], [4.0, -0.7, 0.0]])
    goals = np.array([[4.0, 0.7, 0.0], [0.0, -0.7, 0.0]])
    bus, sched, nodes = launch_formation(
        2, starts, goals, factory, takeoff_time=0.5, filter_rate=10.0)
    sched.run_until(8.0)

    for i, plant in enumerate(nodes["plants"]):
        err = np.linalg.norm(plant._pos[:2] - goals[i][:2])
        assert err < 0.5, (i, plant._pos, goals[i])
    # estimator produced estimates and controller tracked a curve
    assert all(len(c.path_log) > 100 for c in nodes["controllers"])
    # min pairwise distance respected safety (Ds=0.3 + robot extent)
    p0 = np.asarray([p for p in nodes["controllers"][0].path_log])
    p1 = np.asarray([p for p in nodes["controllers"][1].path_log])
    n = min(len(p0), len(p1))
    d = np.linalg.norm(p0[:n, :2] - p1[:n, :2], axis=-1)
    assert d.min() > 0.3, d.min()
