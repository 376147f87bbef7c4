"""Audit the raw path's non-usable lanes against the exact oracle.

The f32 IPM production path reports usable 0.9974 on the bench ensemble.
This classifies the remaining ~0.26%: solve the SAME dense QPs with the
native exact oracle (native/qp_oracle.cpp, the CPLEX stand-in) and
report its status per failed lane. If the oracle also fails/declares
infeasible, the lanes are genuinely infeasible random-geometry QPs —
not solver shortfalls.

Usage: python scripts/audit_failed_lanes.py [batch] [platform]
"""

from __future__ import annotations

import sys

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    platform = sys.argv[2] if len(sys.argv) > 2 else None

    sys.path.insert(0, "/root/repo")
    if platform:
        from mpc_cbf_tpu.utils.runtime import force_platform
        force_platform(platform)

    import jax
    import jax.numpy as jnp

    from mpc_cbf_tpu.types import State
    from mpc_cbf_tpu.ops.cbf import FovCBF
    from mpc_cbf_tpu.ops.qp.ipm import StructuredIPM, IPM_F32_ENTRY
    from mpc_cbf_tpu.ops.qp.oracle import solve_oracle_batch
    from mpc_cbf_tpu.controllers import (
        BezierParams, MPCParams, BezierMPCOperator, IMPCParams, FovIMPCCBF)
    from mpc_cbf_tpu.controllers.mpc_cbf import _rank_weights

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
    active0 = jnp.arange(H) == 0
    A_d, lb_d, ub_d = jax.vmap(
        lambda cp, cv, blob, m, pr: ctrl.dynamic_rows(
            State(pos=cp, vel=cv), blob, m, pr, active0)
    )(current.pos, current.vel, nbr, mask, pred0)

    P, A_s, eq_mask = ctrl.static_parts()
    ipm = StructuredIPM(P, A_s, eq_mask, ctrl.m_dynamic, IPM_F32_ENTRY)
    sol = ipm.solve(q, lb_s, ub_s, A_d, lb_d, ub_d)
    pri = np.asarray(sol.pri_res)
    failed = pri >= ctrl.USABLE_PRI_EPS
    print(f"batch={batch} usable={1 - failed.mean():.4f} "
          f"failed={failed.sum()}", flush=True)
    if not failed.any():
        return

    # dense-assemble the failed lanes and hand them to the exact oracle
    def build(p, v, r, nb, mk):
        x = jnp.concatenate([p, v])
        return ctrl.assemble(State(pos=p, vel=v), r, nb, mk,
                             jnp.broadcast_to(x, (H, 2 * op.dim)), active0)

    idx = np.nonzero(failed)[0]
    qp = jax.vmap(build)(pos[idx], vel[idx], ref[idx], nbr[idx], mask[idx])
    x_ref, status = solve_oracle_batch(*(np.asarray(v, np.float64) for v in
                                         (qp.P, qp.q, qp.A, qp.lb, qp.ub)))
    # status: 0 = optimal, nonzero = failed/infeasible (oracle.py)
    print(f"oracle status on failed lanes: "
          f"{dict(zip(*np.unique(status, return_counts=True)))}", flush=True)
    ok = status == 0
    if ok.any():
        # lanes the oracle solves but the raw path missed: measure how
        # infeasible the oracle's own solution is (near-infeasible QPs?)
        A = np.asarray(qp.A, np.float64)[ok]
        lo = np.asarray(qp.lb, np.float64)[ok]
        hi = np.asarray(qp.ub, np.float64)[ok]
        ax = np.einsum("bmn,bn->bm", A, x_ref[ok])
        viol = np.maximum(np.maximum(lo - ax, ax - hi), 0.0)
        print(f"oracle-solvable-but-raw-failed: {ok.sum()} lanes; "
              f"oracle viol max {viol.max():.2e}; raw pri on them: "
              f"{pri[idx][ok]}", flush=True)


if __name__ == "__main__":
    main()
