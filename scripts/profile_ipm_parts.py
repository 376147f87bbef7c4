"""Ablate the f32 IPM iteration body to find where time goes.

Times stripped variants of the per-iteration work at the production
shape (fov flagship, batch 8192, 22 iterations):
  full       the real Mehrotra body (reference point)
  nochol     Cholesky + solves replaced by a diagonal-preconditioner
             apply (isolates the factorization/solve cost)
  nohform    H formation einsums replaced by a constant (isolates the
             weighted-Gram build cost)
  matonly    only the matvec/rmatvec GEMMs per iteration

Usage: python scripts/profile_ipm_parts.py [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/scripts")
    from _fov_ensemble import build_fov_ensemble
    from mpc_cbf_tpu.ops.qp.ipm import StructuredIPM, IPM_F32_ENTRY

    ctrl, args0, _ = build_fov_ensemble(batch)
    P, A_s, eq_mask = ctrl.static_parts()
    ipm = StructuredIPM(P, A_s, eq_mask, ctrl.m_dynamic, IPM_F32_ENTRY)
    nz, m_si, m_d = ipm.nz, ipm.m_si, ipm.m_d
    m = m_si + m_d
    print(f"batch={batch} nz={nz} m_si={m_si} m_d={m_d}", flush=True)

    q, lb_s, ub_s, A_d, lb_d, ub_d = (jnp.asarray(a, jnp.float32)
                                      for a in args0)
    B = batch
    f32 = jnp.float32

    # precompute the same per-solve tensors _solve builds
    b_e = lb_s[:, ipm.eq_idx]
    x_p = b_e @ ipm.Epinvb.T
    q_t = q @ ipm.Zb + x_p @ ipm.PZb
    gamma = 1.0 / jnp.maximum(jnp.max(jnp.abs(q_t), axis=1), ipm._pmax)
    q_t = q_t * gamma[:, None]
    GdZ = jnp.einsum("bmn,nk->bmk", A_d, ipm.Zb, preferred_element_type=f32)
    ed = 1.0 / jnp.maximum(jnp.max(jnp.abs(GdZ), axis=2), 1e-12)
    GdZ = GdZ * ed[:, :, None]
    Pg = ipm.Ptb[None] * gamma[:, None, None]
    eyef = jnp.eye(nz, dtype=f32)

    def matvec(V):
        return jnp.concatenate(
            [V @ ipm.GsZb.T, jnp.einsum("bmk,bk->bm", GdZ, V)], axis=1)

    def rmatvec(Y):
        return Y[:, :m_si] @ ipm.GsZb \
            + jnp.einsum("bmk,bm->bk", GdZ, Y[:, m_si:])

    def run(kind):
        def body(carry, _):
            v, t, zl, zu = carry
            Gv = matvec(v)
            g_l = jnp.abs(t) + 1.0
            g_u = jnp.abs(1.0 - t) + 1.0
            D = zl / g_l + zu / g_u
            if kind in ("full", "nochol"):
                H = Pg + 1e-6 * eyef[None] \
                    + jnp.einsum("mi,bm,mj->bij", ipm.GsZb, D[:, :m_si],
                                 ipm.GsZb, preferred_element_type=f32) \
                    + jnp.einsum("bmi,bm,bmj->bij", GdZ, D[:, m_si:], GdZ,
                                 preferred_element_type=f32)
            else:
                H = Pg + (1e-6 + jnp.sum(D, 1)[:, None, None]) * eyef[None]
            rhs1 = -q_t - rmatvec(D * Gv)
            rhs2 = rhs1 * 0.5 + v
            if kind in ("full",):
                L = jnp.linalg.cholesky(H)
                dv1 = jax.scipy.linalg.cho_solve((L, True), rhs1[..., None])[..., 0]
                dv2 = jax.scipy.linalg.cho_solve((L, True), rhs2[..., None])[..., 0]
            elif kind in ("nochol", "nohform"):
                dH = 1.0 / (jnp.einsum("bii->bi", H) + 1.0)
                dv1 = rhs1 * dH
                dv2 = rhs2 * dH
            else:  # matonly
                dv1, dv2 = rhs1, rhs2
            dt_ = matvec(dv1 + dv2)
            a = 1.0 / (1.0 + jnp.max(jnp.abs(dt_), 1))[:, None]
            v = v + a * dv1 * 0.1
            t = t + (a * dt_ * 0.1)[:, : m]
            zl = jnp.abs(zl + a * dv2[:, :1] * 0.01) + 1e-6
            zu = jnp.abs(zu - a * dv2[:, :1] * 0.01) + 1e-6
            return (v, t, zl, zu), None

        @jax.jit
        def go():
            v = jnp.zeros((B, nz), f32)
            t = jnp.zeros((B, m), f32)
            zl = jnp.ones((B, m), f32)
            zu = jnp.ones((B, m), f32)
            (v, *_), _ = jax.lax.scan(body, (v, t, zl, zu), None, length=22)
            return v

        o = go()
        jax.block_until_ready(o)
        ts = time.perf_counter()
        for _ in range(3):
            o = go()
            float(jnp.sum(o))
        dt = (time.perf_counter() - ts) / 3
        print(f"{kind:9s} {dt*1e3:8.1f} ms  {B/dt:8.0f} lanes/s", flush=True)
        return dt

    t_mat = run("matonly")
    t_nohf = run("nohform")
    t_nochol = run("nochol")
    t_full = run("full")
    print(f"\nsplit: matvecs {t_mat*1e3:.0f} | +H-form "
          f"{(t_nochol-t_nohf)*1e3:.0f} | +chol/solves "
          f"{(t_full-t_nochol)*1e3:.0f} | other "
          f"{(t_nohf-t_mat)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
