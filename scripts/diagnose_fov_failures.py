"""Instrument WHICH rows stall on the fov flagship's failed lanes.

Round-5 directive #2 (VERDICT.md): 31% of production-path lanes fail the
usable bar (pri_res > USABLE_PRI_EPS after the warm-started ADMM). The
reference's CPLEX solves essentially all of them. Before pulling any
lever (per-lane rho_d, stall restart, IPM rescue) — identify the
constraint family that carries the worst violation per failed lane.

Usage: python scripts/diagnose_fov_failures.py [batch] [platform]
"""

from __future__ import annotations

import sys

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    platform = sys.argv[2] if len(sys.argv) > 2 else None

    sys.path.insert(0, "/root/repo")
    if platform:
        from mpc_cbf_tpu.utils.runtime import force_platform
        force_platform(platform)

    import jax
    import jax.numpy as jnp

    from mpc_cbf_tpu.types import State
    from mpc_cbf_tpu.ops.cbf import FovCBF
    from mpc_cbf_tpu.ops.qp.structured import StructuredConfig
    from mpc_cbf_tpu.controllers import (
        BezierParams, MPCParams, BezierMPCOperator, IMPCParams, FovIMPCCBF)
    from mpc_cbf_tpu.controllers.mpc_cbf import StructuredIMPC, _rank_weights

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

    # ---- replicate the IMPC loop but keep per-iteration solver state ----
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
    pos_E = jnp.asarray(op.pw.eval_matrix(list(np.asarray(op.h_samples[:H])), 0), f32)
    vel_E = jnp.asarray(op.pw.eval_matrix(list(np.asarray(op.h_samples[:H])), 1), f32)

    def dyn(active, pred):
        return jax.vmap(
            lambda cp, cv, blob, m, pr: ctrl.dynamic_rows(
                State(pos=cp, vel=cv), blob, m, pr, active)
        )(current.pos, current.vel, nbr, mask, pred)

    op_qp = simpc.op_qp
    sols = []
    rows_per_iter = []
    x0 = None
    ys0 = yd0 = None
    active0 = jnp.arange(H) == 0
    for it in range(impc.impc_iter):
        if it == 0:
            A_d, lb_d, ub_d = dyn(active0, pred0)
        else:
            coeffs = sols[-1].z[:, : op.n_dec]
            p = (coeffs @ pos_E.T).reshape(batch, H, op.dim)
            v = (coeffs @ vel_E.T).reshape(batch, H, op.dim)
            A_d, lb_d, ub_d = dyn(jnp.ones(H, bool),
                                  jnp.concatenate([p, v], axis=-1))
        solver = op_qp if (it == 0 or simpc.op_qp_tail is None) else simpc.op_qp_tail
        sol = solver.solve(q, lb_s, ub_s, A_d, lb_d, ub_d, x0=x0, ys0=ys0, yd0=yd0)
        x0, ys0, yd0 = sol.z, sol.ys, sol.yd
        sols.append(sol)
        rows_per_iter.append((A_d, lb_d, ub_d))

    # ---- per-lane failure classification -------------------------------
    eps = ctrl.USABLE_PRI_EPS
    usable = np.zeros(batch, bool)
    for sol in sols:
        u = np.asarray(sol.converged) | (
            (np.asarray(sol.pri_res) <= eps)
            & np.all(np.isfinite(np.asarray(sol.z)), axis=-1))
        usable |= u
    print(f"batch={batch}  usable={usable.mean():.4f}", flush=True)

    # row layout of A_s (static_parts): eq rows (init+cont), bound rows,
    # slack nonneg; A_d: CBF rows [H, N, F] then Voronoi [N * ncp]
    P_, A_s, eq_mask = ctrl.static_parts()
    m_eq = int(eq_mask.sum())
    m_s = A_s.shape[0]
    m_bd = m_s - m_eq - ctrl.S
    F = ctrl.num_families
    fam_names = ["safety", "fov_lb", "fov_rb", "range"]

    for it, (sol, (A_d, lb_d, ub_d)) in enumerate(zip(sols, rows_per_iter)):
        z = np.asarray(sol.z, np.float64)
        conv = np.asarray(sol.converged)
        pri = np.asarray(sol.pri_res)
        fail = ~(conv | (pri <= eps)) & np.all(np.isfinite(z), axis=1)
        print(f"\niter {it}: converged={conv.mean():.3f} "
              f"failed-usable={fail.mean():.3f} "
              f"pri_res p50/p90/max="
              f"{np.percentile(pri, 50):.3g}/{np.percentile(pri, 90):.3g}/"
              f"{pri.max():.3g}", flush=True)
        if not fail.any():
            continue
        zf = z[fail]
        # shared rows
        As = np.asarray(A_s, np.float64)
        sx = zf @ As.T
        lo = np.asarray(lb_s, np.float64)[fail]
        hi = np.asarray(ub_s, np.float64)[fail]
        viol_s = np.maximum(np.maximum(lo - sx, sx - hi), 0.0)
        # dynamic rows
        Ad = np.asarray(A_d, np.float64)[fail]
        dx = np.einsum("bmn,bn->bm", Ad, zf)
        lod = np.asarray(lb_d, np.float64)[fail]
        hid = np.asarray(ub_d, np.float64)[fail]
        viol_d = np.maximum(np.maximum(lod - dx, dx - hid), 0.0)

        classes = {
            "eq(init/cont)": viol_s[:, :m_eq].max(axis=1),
            "bounds(acc/vel)": viol_s[:, m_eq:m_eq + m_bd].max(axis=1),
            "slack>=0": viol_s[:, m_eq + m_bd:].max(axis=1),
            "voronoi": viol_d[:, ctrl.m_cbf:].max(axis=1)
            if ctrl.m_extra else np.zeros(fail.sum()),
        }
        vc = viol_d[:, :ctrl.m_cbf].reshape(fail.sum(), H, N, F)
        for fi, name in enumerate(fam_names[:F]):
            classes[f"cbf_{name}"] = vc[..., fi].reshape(fail.sum(), -1).max(axis=1)

        names = list(classes)
        stacked = np.stack([classes[k] for k in names], axis=1)  # [Bf, C]
        worst = stacked.argmax(axis=1)
        print("  worst-violation class histogram (failed lanes):")
        for ci, name in enumerate(names):
            cnt = (worst == ci).sum()
            if cnt:
                sel = worst == ci
                print(f"    {name:16s} {cnt:5d} "
                      f"({cnt / fail.sum():.2f})  "
                      f"median viol {np.median(stacked[sel, ci]):.3g}",
                      flush=True)
        # how far from usable are the failures?
        print(f"  failed-lane pri_res: p50={np.percentile(pri[fail], 50):.3g} "
              f"p90={np.percentile(pri[fail], 90):.3g} max={pri[fail].max():.3g}")


if __name__ == "__main__":
    main()
