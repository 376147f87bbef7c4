"""Shared helper: build the fov flagship QP ensemble exactly as bench.py
does (same seed/geometry), at both IMPC iterations.

Used by the round-5 calibration/diagnosis scripts (profile_hybrid,
calibrate_tail, diagnose_fov_failures). Returns the structured-QP batch
arguments for iter-0 (CBF at current state, step 0 active) and a
function producing the iter-1 batch from any iter-0 solution (predicted
states along the solved curve, all horizon steps active) — the same two
problem families the production IMPC loop solves
(controllers/mpc_cbf.py::StructuredIMPC.optimize_batch).
"""

from __future__ import annotations

import numpy as np


def build_fov_ensemble(batch: int, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from mpc_cbf_tpu.types import State
    from mpc_cbf_tpu.ops.cbf import FovCBF
    from mpc_cbf_tpu.controllers import (
        BezierParams, MPCParams, BezierMPCOperator, IMPCParams, FovIMPCCBF)
    from mpc_cbf_tpu.controllers.mpc_cbf import _rank_weights

    mpc = MPCParams()
    rng = np.random.default_rng(seed)
    f32 = jnp.float32
    impc = IMPCParams(slack_mode=True)
    op = BezierMPCOperator(BezierParams(), mpc, dim=3)
    beta = 120.0 * np.pi / 180.0
    cbf = FovCBF(beta, 0.3, 6.0, jnp.asarray(mpc.v_min), jnp.asarray(mpc.v_max))
    N = 7
    ctrl = FovIMPCCBF(op, cbf, impc, N,
                      box_half_extents=np.array([0.1, 0.1, 0.0]))

    ang = rng.uniform(0, 2 * np.pi, (batch, N))
    rad = rng.uniform(1.0, 3.5, (batch, N))
    cov = np.broadcast_to(np.array([0.05, 0.0, 0.05]), (batch, N, 3))
    nbr = jnp.asarray(np.concatenate([
        (rad * np.cos(ang))[..., None], (rad * np.sin(ang))[..., None],
        cov], axis=-1), f32)
    pos = jnp.asarray(rng.normal(0, 0.3, (batch, 3)), f32)
    vel = jnp.asarray(rng.normal(0, 0.5, (batch, 3)), f32)
    goals = jnp.asarray(rng.normal(0, 3.0, (batch, 3)), f32)
    mask = jnp.ones((batch, N), bool)
    current = State(pos=pos, vel=vel)
    ref = jnp.tile(goals[:, None, :], (1, mpc.k_hor, 1)).reshape(batch, -1)

    H = impc.cbf_horizon
    q_dec = jax.vmap(op.linear_cost)(current.stacked, ref)
    q = jnp.zeros((batch, ctrl.n), f32).at[:, : op.n_dec].set(q_dec)

    def slack_w(cur_pos, blob, m):
        d = jax.vmap(lambda nb: ctrl._neighbor_distance(cur_pos, nb))(blob)
        d = jnp.where(m, d, jnp.inf)
        return _rank_weights(d, impc.slack_cost, impc.slack_decay_rate)
    q = q.at[:, op.n_dec:].set(jax.vmap(slack_w)(current.pos, nbr, mask))
    lb_s, ub_s = jax.vmap(ctrl.shared_bounds)(current)
    x_now = current.stacked
    pred0 = jnp.broadcast_to(x_now[:, None, :], (batch, H, x_now.shape[-1]))
    pos_E = jnp.asarray(
        op.pw.eval_matrix(list(np.asarray(op.h_samples[:H])), 0), f32)
    vel_E = jnp.asarray(
        op.pw.eval_matrix(list(np.asarray(op.h_samples[:H])), 1), f32)

    def dyn(active, pred):
        return jax.vmap(
            lambda cp, cv, blob, m, pr: ctrl.dynamic_rows(
                State(pos=cp, vel=cv), blob, m, pr, active)
        )(current.pos, current.vel, nbr, mask, pred)

    A_d0, lb_d0, ub_d0 = dyn(jnp.arange(H) == 0, pred0)
    args0 = (q, lb_s, ub_s, A_d0, lb_d0, ub_d0)

    def iter1_args(z0):
        coeffs = z0[:, : op.n_dec]
        p = (coeffs @ pos_E.T).reshape(batch, H, op.dim)
        v = (coeffs @ vel_E.T).reshape(batch, H, op.dim)
        A_d, lb_d, ub_d = dyn(jnp.ones(H, bool),
                              jnp.concatenate([p, v], axis=-1))
        return (q, lb_s, ub_s, A_d, lb_d, ub_d)

    return ctrl, args0, iter1_args
