"""Double-integrator parity tests (reference DoubleIntegratorTest-style)."""
import numpy as np
import jax.numpy as jnp

from mpc_cbf_tpu.models import DoubleIntegrator, double_integrator_xyyaw
from mpc_cbf_tpu.types import State


def test_ab_matrices_xyyaw():
    # DoubleIntegratorXYYaw.cpp:9-21 with ts=0.1
    m = double_integrator_xyyaw(0.1)
    A, B = m.A, m.B
    assert A.shape == (6, 6) and B.shape == (6, 3)
    np.testing.assert_allclose(A[:3, 3:], 0.1 * np.eye(3))
    np.testing.assert_allclose(A[:3, :3], np.eye(3))
    np.testing.assert_allclose(B[:3], 0.5 * 0.01 * np.eye(3))
    np.testing.assert_allclose(B[3:], 0.1 * np.eye(3))


def test_a0_is_stacked_powers():
    m = DoubleIntegrator(dim=2, ts=0.05)
    K = 7
    pos, vel = m.get_A0(K)
    Ak = np.eye(4)
    for k in range(K):
        Ak = m.A @ Ak
        np.testing.assert_allclose(pos[2 * k : 2 * k + 2], Ak[:2])
        np.testing.assert_allclose(vel[2 * k : 2 * k + 2], Ak[2:])


def test_lambda_matches_rollout():
    """x_k from (A0, Lambda) must equal an explicit rollout of x+ = Ax + Bu."""
    rng = np.random.default_rng(0)
    m = double_integrator_xyyaw(0.1)
    K = 5
    pos_A0, vel_A0 = m.get_A0(K)
    pos_L, vel_L = m.get_lambda(K)
    x0 = rng.normal(size=6)
    us = rng.normal(size=(K, 3))
    # explicit rollout
    xs = []
    x = x0
    for k in range(K):
        x = m.A @ x + m.B @ us[k]
        xs.append(x)
    xs = np.array(xs)
    pred_pos = pos_A0 @ x0 + pos_L @ us.reshape(-1)
    pred_vel = vel_A0 @ x0 + vel_L @ us.reshape(-1)
    np.testing.assert_allclose(pred_pos, xs[:, :3].reshape(-1), atol=1e-12)
    np.testing.assert_allclose(pred_vel, xs[:, 3:].reshape(-1), atol=1e-12)


def test_step_batched():
    m = double_integrator_xyyaw(0.01)
    pos = jnp.ones((4, 3))
    vel = jnp.full((4, 3), 2.0)
    u = jnp.zeros((4, 3))
    s1 = m.step(State(pos, vel), u)
    np.testing.assert_allclose(np.asarray(s1.pos), 1.0 + 0.01 * 2.0)
    np.testing.assert_allclose(np.asarray(s1.vel), 2.0)
