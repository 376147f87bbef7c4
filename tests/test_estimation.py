"""Particle filter tests (reference pf_test.cpp smoke + FOV semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_cbf_tpu.estimation import (
    PFParams, pf_init, pf_predict, pf_update, pf_resample, pf_estimate,
    process_fov_update,
)


def test_init_distribution():
    key = jax.random.PRNGKey(0)
    mean = jnp.array([1.0, -2.0])
    cov = jnp.array([[0.5, 0.1], [0.1, 0.3]])
    st = pf_init(key, mean, cov, PFParams(num_particles=20000))
    m, c = pf_estimate(st)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mean), atol=0.05)
    np.testing.assert_allclose(np.asarray(c), np.asarray(cov), atol=0.05)


def test_update_pulls_toward_measurement():
    key = jax.random.PRNGKey(1)
    st = pf_init(key, jnp.zeros(2), jnp.eye(2), PFParams(num_particles=5000))
    meas = jnp.array([0.8, -0.5])
    st = pf_update(st, meas, 0.1 * jnp.eye(2))
    st = pf_resample(jax.random.PRNGKey(2), st)
    m, _ = pf_estimate(st)
    assert np.linalg.norm(np.asarray(m) - np.asarray(meas)) < 0.3


def test_resample_preserves_mean_and_uniform_weights():
    key = jax.random.PRNGKey(3)
    st = pf_init(key, jnp.array([2.0, 2.0]), 0.2 * jnp.eye(2), PFParams(num_particles=4000))
    st = pf_update(st, jnp.array([2.1, 1.9]), jnp.eye(2))
    st2 = pf_resample(jax.random.PRNGKey(4), st)
    np.testing.assert_allclose(np.asarray(st2.weights), 1.0 / 4000)
    m1, _ = pf_estimate(st2)
    assert np.linalg.norm(np.asarray(m1) - np.array([2.0, 2.0])) < 0.2


def test_fov_negative_information():
    """Target NOT visible although the FOV covers the prior mean: particles
    inside the FOV get down-weighted, so the estimate moves out of the FOV
    (pf_applications.cpp:8-45 semantics)."""
    params = PFParams(num_particles=8000)
    key = jax.random.PRNGKey(5)
    st = pf_init(key, jnp.array([2.0, 0.0]), 1.5 * jnp.eye(2), params)
    ego = jnp.array([0.0, 0.0, 0.0])  # facing +x
    neighbor_true = jnp.array([-3.0, 0.0, 0.0])  # behind ego, invisible
    W = 0.05 * jnp.eye(2)
    st2, mean, cov = process_fov_update(
        jax.random.PRNGKey(6), st, ego, neighbor_true, W, 0.1 * jnp.eye(2),
        fov_beta=2.094, fov_rs=6.0, params=params,
    )
    from mpc_cbf_tpu.ops.geometry import inside_fov
    # estimate should be dragged away from the visible wedge relative to prior
    frac_in_prior = float(jnp.mean(inside_fov(ego, st.particles, 2.094, 6.0)))
    frac_in_post = float(jnp.mean(inside_fov(ego, st2.particles, 2.094, 6.0)))
    assert frac_in_post < frac_in_prior - 0.2


def test_fov_visible_measurement_update():
    """Target visible: estimate converges to the true position."""
    params = PFParams(num_particles=8000)
    st = pf_init(jax.random.PRNGKey(7), jnp.array([3.0, 2.0]), 2.0 * jnp.eye(2), params)
    ego = jnp.array([0.0, 0.0, 0.0])
    neighbor_true = jnp.array([2.0, 0.5, 0.0])  # in the wedge
    W = 0.02 * jnp.eye(2)
    st2, mean, cov = process_fov_update(
        jax.random.PRNGKey(8), st, ego, neighbor_true, W, 0.05 * jnp.eye(2),
        fov_beta=2.094, fov_rs=6.0, params=params,
    )
    assert np.linalg.norm(np.asarray(mean) - np.array([2.0, 0.5])) < 0.3


def test_vmapped_filters():
    """One filter per (agent, target) pair, all in lockstep."""
    params = PFParams(num_particles=512)
    A, T = 3, 2
    keys = jax.random.split(jax.random.PRNGKey(9), A * T).reshape(A, T, 2)
    means = jnp.zeros((A, T, 2))
    cov = jnp.eye(2)
    init_fn = jax.vmap(jax.vmap(lambda k, m: pf_init(k, m, cov, params)))
    sts = init_fn(keys, means)
    assert sts.particles.shape == (A, T, 512, 2)
    est = jax.vmap(jax.vmap(pf_estimate))(sts)
    assert est[0].shape == (A, T, 2)
