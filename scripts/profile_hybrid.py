"""Profile the hybrid certified solver's f32-entry / f64-tail split.

Round-5 directive #1 (VERDICT.md): the hybrid runs 589 solves/s/chip vs
the 1,250/chip bar. Before pulling any lever, measure where the time
goes: the 22-iteration f32 Mehrotra entry (MXU arithmetic) vs the
10-iteration f64 tail (software-emulated f64 on v5e).

Usage:  python scripts/profile_hybrid.py [batch]

Builds the fov flagship QP ensemble exactly as bench.py does (same seed,
same geometry), assembles the structured QP batch once, then times:
  - entry.solve alone
  - tail.solve alone (warm-started from the entry state)
  - full HybridIPM.solve
  - tail with reduced iteration counts (8, 6, 5, 4, 3) — certification
    quality measured as converged-rate + max deviation vs the f64
    reference run (30-iter cold IPM)
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import build  # noqa: F401  (ensures same config wiring)
    from mpc_cbf_tpu.types import State
    from mpc_cbf_tpu.ops.cbf import FovCBF
    from mpc_cbf_tpu.controllers import (
        BezierParams, MPCParams, BezierMPCOperator, IMPCParams, FovIMPCCBF)
    from mpc_cbf_tpu.ops.qp.ipm import (
        StructuredIPM, IPMConfig, IPM_F32_ENTRY, IPM_F64_TAIL)

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

    # assemble the iter-0 QP batch once (iter-0 geometry; the IMPC loop's
    # two solves share the family, so the per-solve cost is what matters)
    current = State(pos=pos, vel=vel)
    ref = jnp.tile(goals[:, None, :], (1, mpc.k_hor, 1)).reshape(batch, -1)
    H = impc.cbf_horizon

    q_dec = jax.vmap(op.linear_cost)(current.stacked, ref)
    q = jnp.zeros((batch, ctrl.n), f32).at[:, : op.n_dec].set(q_dec)
    from mpc_cbf_tpu.controllers.mpc_cbf import _rank_weights

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
    args = (q, lb_s, ub_s, A_d, lb_d, ub_d)
    print(f"batch={batch} n={ctrl.n} m_d={ctrl.m_dynamic} "
          f"m_s={lb_s.shape[1]}", flush=True)

    P, A_s, eq_mask = ctrl.static_parts()
    m_d = ctrl.m_dynamic

    def timed(fn, label, reps=3):
        out = fn()
        jax.block_until_ready(out)
        # force remote readback (axon tunnel)
        float(jnp.sum(out.z))
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn()
            float(jnp.sum(o.z))
        dt = (time.perf_counter() - t0) / reps
        conv = float(jnp.mean(o.converged))
        print(f"{label:34s} {dt*1e3:9.1f} ms  {batch/dt:9.0f} lanes/s "
              f"conv={conv:.3f}", flush=True)
        return o, dt

    entry = StructuredIPM(P, A_s, eq_mask, m_d, IPM_F32_ENTRY)
    tail = StructuredIPM(P, A_s, eq_mask, m_d, IPM_F64_TAIL)

    ent_sol, t_ent = timed(lambda: entry.solve(*args), "f32 entry (22 it)")
    ent_state = ent_sol.state
    tail_sol, t_tail = timed(lambda: tail.solve(*args, state0=ent_state),
                             "f64 tail (10 it, warm)")
    print(f"split: entry {t_ent*1e3:.1f} ms vs tail {t_tail*1e3:.1f} ms "
          f"({t_tail/(t_ent+t_tail)*100:.0f}% tail)", flush=True)

    # reference solution for deviation: cold 30-iteration f64 IPM
    ref_ipm = StructuredIPM(P, A_s, eq_mask, m_d, IPMConfig())
    ref_sol = ref_ipm.solve(*args)
    jax.block_until_ready(ref_sol.z)
    z_ref = np.asarray(ref_sol.z)
    conv_ref = np.asarray(ref_sol.converged)
    print(f"reference cold f64 (30 it): conv={conv_ref.mean():.3f}",
          flush=True)

    # control deviation = first-period sampled accel difference is the
    # production bar's measure; control points are a fine proxy here
    # (U_basis is fixed; ||U (z1 - z2)||_inf <= ||U||_inf ||z1-z2||_inf)
    def dev(z):
        d = np.abs(np.asarray(z)[:, :op.n_dec] - z_ref[:, :op.n_dec])
        return d.max(axis=1)

    both = conv_ref & np.asarray(tail_sol.converged)
    d10 = dev(tail_sol.z)
    print(f"tail-10: conv={np.asarray(tail_sol.converged).mean():.4f} "
          f"dev(max over conv lanes)={d10[both].max():.2e} "
          f"median={np.median(d10[both]):.2e}", flush=True)

    for it in (8, 6, 5, 4, 3):
        cfgk = dataclasses.replace(IPM_F64_TAIL, iters=it)
        tk = StructuredIPM(P, A_s, eq_mask, m_d, cfgk)
        sk, t_k = timed(lambda: tk.solve(*args, state0=ent_state),
                        f"f64 tail ({it} it, warm)")
        bothk = conv_ref & np.asarray(sk.converged)
        dk = dev(sk.z)
        nconv = np.asarray(sk.converged).mean()
        frac_over = (dk[bothk] > 1e-3).mean() if bothk.any() else float("nan")
        print(f"   -> conv={nconv:.4f} dev_max={dk[bothk].max():.2e} "
              f"median={np.median(dk[bothk]):.2e} "
              f"frac>1e-3={frac_over:.4f}", flush=True)


if __name__ == "__main__":
    main()
