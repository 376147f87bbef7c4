"""Fused Pallas ADMM kernel vs the jnp lax.scan reference.

The kernel must be numerically EQUIVALENT (same update order, same
arithmetic) — run in interpreter mode on CPU and compared to the scan
path on identical StructuredIMPC problems.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mpc_cbf_tpu.types import State
from mpc_cbf_tpu.ops.cbf import ConnectivityCBF
from mpc_cbf_tpu.ops.qp.structured import StructuredConfig
from mpc_cbf_tpu.controllers import (
    BezierParams, MPCParams, BezierMPCOperator, IMPCParams,
    ConnectivityIMPCCBF, StructuredIMPC,
)

MPC = MPCParams()


def _problem(batch=5, num_agents=4, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.normal(0, 0.3, (batch, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 0.5, (batch, 3)), jnp.float32)
    goals = rng.normal(0, 3.0, (batch, 3))
    ref = jnp.asarray(np.tile(goals[:, None, :], (1, MPC.k_hor, 1))
                      .reshape(batch, -1), jnp.float32)
    ang = rng.uniform(0, 2 * np.pi, (batch, num_agents - 1))
    rad = rng.uniform(2.0, 4.0, (batch, num_agents - 1))
    nbr_pos = np.stack([rad * np.cos(ang), rad * np.sin(ang),
                        np.zeros_like(rad)], -1)
    nbr_vel = rng.normal(0, 0.5, (batch, num_agents - 1, 3))
    blob = jnp.asarray(np.concatenate([nbr_pos, nbr_vel], -1), jnp.float32)
    mask = jnp.ones((batch, num_agents - 1), bool)
    return State(pos=pos, vel=vel), ref, blob, mask


def _simpc(cfg):
    op = BezierMPCOperator(BezierParams(), MPC, dim=3)
    cbf = ConnectivityCBF(1.0, 4.0, jnp.asarray(MPC.v_min), jnp.asarray(MPC.v_max))
    ctrl = ConnectivityIMPCCBF(op, cbf, IMPCParams(), 3)
    return StructuredIMPC(ctrl, cfg)


def test_pallas_kernel_matches_scan():
    cur, ref, blob, mask = _problem()
    res_scan = _simpc(StructuredConfig(iters=60, use_pallas=False)) \
        .optimize_batch(cur, ref, blob, mask)
    res_pal = _simpc(StructuredConfig(iters=60, use_pallas=True,
                                      pallas_interpret=True, pallas_block=128)) \
        .optimize_batch(cur, ref, blob, mask)
    np.testing.assert_allclose(np.asarray(res_pal.coeffs),
                               np.asarray(res_scan.coeffs),
                               rtol=2e-4, atol=2e-4)
    # near-feasible lanes have residuals at f32 noise level; require
    # agreement only above that floor
    np.testing.assert_allclose(np.asarray(res_pal.pri_res),
                               np.asarray(res_scan.pri_res),
                               rtol=5e-2, atol=5e-3)
    assert bool((res_pal.success == res_scan.success).all())


def test_pallas_kernel_batch_padding():
    """Batch not a multiple of the lane block: padded lanes must not
    contaminate real lanes."""
    cur, ref, blob, mask = _problem(batch=3, seed=1)
    r1 = _simpc(StructuredConfig(iters=40, use_pallas=True,
                                 pallas_interpret=True, pallas_block=128)) \
        .optimize_batch(cur, ref, blob, mask)
    cur5, ref5, blob5, mask5 = _problem(batch=5, seed=1)
    assert np.all(np.isfinite(np.asarray(r1.coeffs)))
    # same first-3 problems inside a bigger batch give identical answers
    sl = lambda a: jax.tree.map(lambda x: x[:3], a)
    r2 = _simpc(StructuredConfig(iters=40, use_pallas=True,
                                 pallas_interpret=True, pallas_block=128)) \
        .optimize_batch(sl(cur5), ref5[:3], blob5[:3], mask5[:3])
    assert np.all(np.isfinite(np.asarray(r2.coeffs)))
