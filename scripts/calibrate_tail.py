"""Calibrate a PRODUCTION-certificate f64 tail for the hybrid IPM.

Round-5 directive #1: the shipping tail (IPM_F64_TAIL, 10 iters) drives
mu to ~1e-10 / deviation ~1e-5..1e-7, but the BASELINE contract is
deviation < 1e-3. Find the fewest f64 iterations + loosest convergence
bars whose ACCEPTED lanes still provably meet the two-part certificate
(deviation < 1e-3 vs the exact optimum, OR e-equal-optimal: feasible
with matching objective), with acceptance >= 0.99.

Also measures:
  - iter-1 problems (the second IMPC solve: predicted-state rows, all
    horizon steps active) with (a) fresh entry+tail, (b) TAIL-STATE
    REUSE (no f32 entry — directive #8),
  - entry length 22 vs 30,
  - warm_mu_floor 1e-4 vs 1e-5 (less re-inflation => shorter tail?).

Usage: python scripts/calibrate_tail.py [batch]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def lane_diag(sol, z_ref, f_ref, P64, q64, n_dec):
    """Per-lane arrays: mu, pri, dual, deviation, relative objective gap."""
    z = np.asarray(sol.z, np.float64)
    dev = np.abs(z[:, :n_dec] - z_ref[:, :n_dec]).max(axis=1)
    f = 0.5 * np.einsum("bi,ij,bj->b", z, P64, z) + np.einsum("bi,bi->b", q64, z)
    gap = (f - f_ref) / np.maximum(1.0, np.abs(f_ref))
    return (np.asarray(sol.mu), np.asarray(sol.pri_res),
            np.asarray(sol.dual_res), dev, gap)


def report(tag, mu, pri, dual, dev, gap, ref_ok, t=None):
    """Certified-rate table under candidate production bars."""
    B = mu.shape[0]
    hdr = f"{tag}"
    if t is not None:
        hdr += f"  [{t*1e3:.1f} ms, {B/t:.0f} lanes/s]"
    print(hdr, flush=True)
    for M, D in [(1e-9, 1e-6), (1e-8, 1e-5), (1e-7, 1e-5), (1e-7, 1e-4),
                 (1e-6, 1e-4), (1e-5, 1e-4)]:
        acc = (mu < M) & (pri < 1e-7) & (dual < D)
        if not acc.any():
            print(f"  mu<{M:.0e} dual<{D:.0e}: accept 0.000")
            continue
        # certificate on accepted lanes we can check (ref converged):
        chk = acc & ref_ok
        certified = (dev[chk] < 1e-3) | ((gap[chk] < 1e-5) & (pri[chk] < 1e-7))
        bad = (~certified).sum()
        print(f"  mu<{M:.0e} dual<{D:.0e}: accept {acc.mean():.4f}  "
              f"cert-ok {certified.mean():.4f} ({bad} bad)  "
              f"dev p50/max {np.median(dev[chk]):.1e}/{dev[chk].max():.1e}  "
              f"gap max {gap[chk].max():.1e}", flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/scripts")
    from _fov_ensemble import build_fov_ensemble
    from mpc_cbf_tpu.ops.qp.ipm import (
        StructuredIPM, IPMConfig, IPM_F32_ENTRY, IPM_F64_TAIL)

    ctrl, args0, iter1_args = build_fov_ensemble(batch)
    P, A_s, eq_mask = ctrl.static_parts()
    m_d = ctrl.m_dynamic
    n_dec = ctrl.op.n_dec
    P64 = np.asarray(P, np.float64)

    def timed(fn, reps=2):
        o = fn()
        jax.block_until_ready(o)
        float(jnp.sum(o.z))
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn()
            float(jnp.sum(o.z))
        return o, (time.perf_counter() - t0) / reps

    # reference: cold 40-iter f64 on both problem sets
    ref_ipm = StructuredIPM(P, A_s, eq_mask, m_d, IPMConfig(iters=40))
    ref0 = ref_ipm.solve(*args0)
    jax.block_until_ready(ref0.z)
    z_ref0 = np.asarray(ref0.z, np.float64)
    ok_ref0 = np.asarray(ref0.converged)
    q64_0 = np.asarray(args0[0], np.float64)
    f_ref0 = (0.5 * np.einsum("bi,ij,bj->b", z_ref0, P64, z_ref0)
              + np.einsum("bi,bi->b", q64_0, z_ref0))
    print(f"ref0 (cold f64 40it): conv={ok_ref0.mean():.4f}", flush=True)

    args1 = iter1_args(ref0.z.astype(jnp.float32))
    ref1 = ref_ipm.solve(*args1)
    jax.block_until_ready(ref1.z)
    z_ref1 = np.asarray(ref1.z, np.float64)
    ok_ref1 = np.asarray(ref1.converged)
    q64_1 = np.asarray(args1[0], np.float64)
    f_ref1 = (0.5 * np.einsum("bi,ij,bj->b", z_ref1, P64, z_ref1)
              + np.einsum("bi,bi->b", q64_1, z_ref1))
    print(f"ref1 (iter-1 problems): conv={ok_ref1.mean():.4f}", flush=True)

    # ---- entry variants -------------------------------------------------
    entry22 = StructuredIPM(P, A_s, eq_mask, m_d, IPM_F32_ENTRY)
    ent0, t_e22 = timed(lambda: entry22.solve(*args0))
    print(f"\nentry22 iter0: {t_e22*1e3:.1f} ms  pri<1e-3 rate "
          f"{(np.asarray(ent0.pri_res) < 1e-3).mean():.4f}  "
          f"pri<0.05 rate {(np.asarray(ent0.pri_res) < 0.05).mean():.4f}",
          flush=True)
    # raw-path candidate quality: f32 entry deviation stats
    mu, pri, dual, dev, gap = lane_diag(ent0, z_ref0, f_ref0, P64, q64_0, n_dec)
    print(f"entry22 dev vs ref (ref-conv lanes): "
          f"p50={np.median(dev[ok_ref0]):.2e} p99="
          f"{np.percentile(dev[ok_ref0], 99):.2e} max={dev[ok_ref0].max():.2e}",
          flush=True)

    entry30 = StructuredIPM(
        P, A_s, eq_mask, m_d, dataclasses.replace(IPM_F32_ENTRY, iters=30))
    ent30, t_e30 = timed(lambda: entry30.solve(*args0))
    print(f"entry30 iter0: {t_e30*1e3:.1f} ms", flush=True)

    # ---- tail sweeps on iter-0 -----------------------------------------
    print("\n=== iter-0 tails (entry22 state) ===", flush=True)
    for it in (4, 5, 6, 8, 10):
        cfg = dataclasses.replace(IPM_F64_TAIL, iters=it)
        tailk = StructuredIPM(P, A_s, eq_mask, m_d, cfg)
        sol, t = timed(lambda: tailk.solve(*args0, state0=ent0.state))
        report(f"tail{it}", *lane_diag(sol, z_ref0, f_ref0, P64, q64_0, n_dec),
               ok_ref0, t)

    print("\n=== iter-0 tails (entry30 state) ===", flush=True)
    for it in (4, 5):
        cfg = dataclasses.replace(IPM_F64_TAIL, iters=it)
        tailk = StructuredIPM(P, A_s, eq_mask, m_d, cfg)
        sol, t = timed(lambda: tailk.solve(*args0, state0=ent30.state))
        report(f"tail{it}@e30", *lane_diag(sol, z_ref0, f_ref0, P64, q64_0,
                                           n_dec), ok_ref0, t)

    print("\n=== iter-0 tails, warm_mu_floor=1e-5 (entry22) ===", flush=True)
    for it in (4, 5, 6):
        cfg = dataclasses.replace(IPM_F64_TAIL, iters=it, warm_mu_floor=1e-5)
        tailk = StructuredIPM(P, A_s, eq_mask, m_d, cfg)
        sol, t = timed(lambda: tailk.solve(*args0, state0=ent0.state))
        report(f"tail{it}@mf1e-5", *lane_diag(sol, z_ref0, f_ref0, P64, q64_0,
                                              n_dec), ok_ref0, t)

    # ---- iter-1: entry+tail vs TAIL-STATE REUSE ------------------------
    tail6 = StructuredIPM(P, A_s, eq_mask, m_d,
                          dataclasses.replace(IPM_F64_TAIL, iters=6))
    sol0_t6 = tail6.solve(*args0, state0=ent0.state)
    jax.block_until_ready(sol0_t6.z)

    print("\n=== iter-1 via fresh entry+tail ===", flush=True)
    ent1, t_e1 = timed(lambda: entry22.solve(*args1))
    for it in (5, 6, 8):
        cfg = dataclasses.replace(IPM_F64_TAIL, iters=it)
        tailk = StructuredIPM(P, A_s, eq_mask, m_d, cfg)
        sol, t = timed(lambda: tailk.solve(*args1, state0=ent1.state))
        report(f"i1 entry+tail{it} (+{t_e1*1e3:.0f} ms entry)",
               *lane_diag(sol, z_ref1, f_ref1, P64, q64_1, n_dec), ok_ref1, t)

    print("\n=== iter-1 via tail-state REUSE (no entry) ===", flush=True)
    for it in (5, 6, 8, 10):
        cfg = dataclasses.replace(IPM_F64_TAIL, iters=it)
        tailk = StructuredIPM(P, A_s, eq_mask, m_d, cfg)
        sol, t = timed(lambda: tailk.solve(*args1, state0=sol0_t6.state))
        report(f"i1 reuse tail{it}",
               *lane_diag(sol, z_ref1, f_ref1, P64, q64_1, n_dec), ok_ref1, t)


if __name__ == "__main__":
    main()
