"""Structure-exploiting batched ADMM for the MPC-CBF QP family.

The dense batched solver (admm.py) treats every problem in the batch as
unrelated: per-problem [n,n] factorizations and per-problem [m,n] matvecs —
thousands of tiny GEMVs the MXU cannot tile. But across an agent/scenario
batch the MPC QPs share almost everything:

- P (cost quadratic) is identical (slack block is zero),
- the equality rows (init-state eval, continuity), the sampled accel/vel
  bound rows, and the slack-nonnegativity rows have identical
  *coefficients* — only their lb/ub targets differ per agent,
- only the CBF + separating-hyperplane rows (m_d ~ tens) differ per agent.

This module splits A = [A_s (shared, m_s rows); A_d (per-problem, m_d
rows)] and runs the ADMM x-update through the Woodbury identity:

    M_b = M_s + U_b' R_b U_b,   M_s = P + sigma I + A_s' diag(rho_s) A_s
    M_b^{-1} v = Ms_inv v - W_b (C_b)^{-1} W_b' v
    W_b = Ms_inv U_b',   C_b = R_b^{-1} + U_b Ms_inv U_b'

so the O(n^2) and O(n m_s) work per iteration becomes two big shared
matmuls over the whole batch in transposed layout [n, B] / [m_s, B] —
exactly the shape the MXU wants — while the per-problem work shrinks to
O(m_d n + m_d^2) einsums. Ms_inv is precomputed once at build time in
float64 numpy.

rho is fixed per row class (no per-problem adaptation — that would break
the shared factorization); MPC use warm-starts across steps, where fixed
rho is the standard OSQP regime.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mpc_cbf_tpu.types import Array, BIG


@dataclasses.dataclass(frozen=True)
class StructuredConfig:
    iters: int = 200
    sigma: float = 1e-6
    rho: float = 0.1
    rho_eq_scale: float = 1e3
    alpha: float = 1.6
    eps_pri: float = 5e-3     # f32 bar (relative)
    refine_steps: int = 1
    # fused Pallas iteration loop (ops/qp/pallas_admm.py): None = auto
    # (on for f32 on TPU backends); False = jnp lax.scan; True = force
    # (with pallas_interpret for CPU testing)
    use_pallas: Optional[bool] = None
    # 1024 lanes x ~800 f32 state/lane ~ 3.3 MB of VMEM-resident state —
    # the measured throughput optimum (2048 overflows VMEM on v5e)
    pallas_block: int = 1024
    pallas_interpret: bool = False
    # f64 active-set polish after the ADMM iterations (ops/qp/polish.py):
    # certifies each lane to f64 optimality (<1e-3 control-deviation bar met
    # from an f32 ADMM entry); lanes that fail certification keep their
    # ADMM iterate. Requires jax_enable_x64.
    polish: bool = False


class StructuredSolution(NamedTuple):
    z: Array        # [B, n]
    pri_res: Array  # [B]
    converged: Array


class StructuredQPOperator:
    """Shared-structure operator built once per controller configuration.

    P [n, n]; A_s [m_s, n]; eq_mask_s [m_s] marks shared equality rows
    (lb == ub per problem construction — e.g. init/continuity rows).
    """

    def __init__(self, P: np.ndarray, A_s: np.ndarray, eq_mask_s: np.ndarray,
                 m_d: int, cfg: StructuredConfig = StructuredConfig(),
                 dtype=jnp.float32, q_scale_hint: float = 0.0):
        n = P.shape[0]
        self.n, self.m_s, self.m_d = n, A_s.shape[0], m_d
        self.cfg = cfg

        # static Ruiz-style equilibration from the shared blocks (float64):
        # variable scaling d from [P; A_s] column norms, row scaling e_s.
        P64, A64 = np.asarray(P, np.float64), np.asarray(A_s, np.float64)
        d = np.ones(n)
        e = np.ones(self.m_s)
        for _ in range(10):
            col = np.maximum(np.abs(P64).max(axis=0), np.abs(A64).max(axis=0) if self.m_s else 0)
            dn = np.where(col > 1e-10, 1.0 / np.sqrt(col), 1.0)
            P64 = dn[:, None] * P64 * dn[None, :]
            A64 = A64 * dn[None, :]
            row = np.abs(A64).max(axis=1)
            en = np.where(row > 1e-10, 1.0 / np.sqrt(row), 1.0)
            A64 = en[:, None] * A64
            d, e = d * dn, e * en
        # cost normalization. The linear term isn't known at build time, so
        # callers pass the magnitude of its largest expected entry (e.g. the
        # slack cost) as q_scale_hint — without it, large linear weights
        # stall the fixed-rho iteration exactly as they did the dense solver
        # before |q|_inf entered its Ruiz gamma.
        q_hint_scaled = q_scale_hint * (np.median(d) if n else 1.0)
        gamma = 1.0 / max(np.abs(P64).max(axis=0).mean(), q_hint_scaled, 1e-12)
        P64 *= gamma

        # unscaled copies for the f64 polish (it re-equilibrates internally)
        self._P0 = np.asarray(P, np.float64)
        self._A_s0 = np.asarray(A_s, np.float64)
        self._n_eq = int(np.sum(eq_mask_s))

        rho_s = np.where(eq_mask_s, cfg.rho * cfg.rho_eq_scale, cfg.rho)
        M_s = P64 + cfg.sigma * np.eye(n) + (A64.T * rho_s) @ A64
        Ms_inv = np.linalg.inv(M_s)

        self.D = jnp.asarray(d, dtype)
        self.E_s = jnp.asarray(e, dtype)
        self.gamma = float(gamma)
        self.Pb = jnp.asarray(P64, dtype)
        self.A_sb = jnp.asarray(A64, dtype)
        self.Ms_inv = jnp.asarray(Ms_inv, dtype)
        self.rho_s = jnp.asarray(rho_s, dtype)
        self.rho_d = cfg.rho

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0,))
    def solve(self, q: Array, lb_s: Array, ub_s: Array,
              A_d: Array, lb_d: Array, ub_d: Array,
              x0: Optional[Array] = None) -> StructuredSolution:
        """q [B, n]; lb_s/ub_s [B, m_s]; A_d [B, m_d, n]; lb_d/ub_d [B, m_d].

        Returns primal solutions in the ORIGINAL (unscaled) coordinates.
        """
        with jax.default_matmul_precision("highest"):
            return self._solve(q, lb_s, ub_s, A_d, lb_d, ub_d, x0)

    def solve_polished(self, q: Array, lb_s: Array, ub_s: Array,
                       A_d: Array, lb_d: Array, ub_d: Array,
                       x0: Optional[Array] = None,
                       polish_cfg=None) -> StructuredSolution:
        """ADMM entry (any dtype, f32 in production) + f64 active-set polish.

        Each lane is either certified to f64 optimality (converged=True,
        pri_res = its exact relative violation) or falls back to its ADMM
        iterate with the ADMM residual/convergence flags. This is the
        production path matching the reference's exact-CPLEX semantics
        (qpcpp/src/solvers/CPLEX.cpp:35-178) at TPU throughput.
        """
        from mpc_cbf_tpu.ops.qp.polish import polish_structured, PolishConfig

        sol = self.solve(q, lb_s, ub_s, A_d, lb_d, ub_d, x0=x0)
        res = polish_structured(
            self._P0, self._A_s0, q, lb_s, ub_s, A_d, lb_d, ub_d, sol.z,
            polish_cfg if polish_cfg is not None else PolishConfig(),
            max_eq=self._n_eq)
        z = jnp.where(res.ok[:, None], res.z, sol.z.astype(res.z.dtype))
        return StructuredSolution(
            z=z.astype(sol.z.dtype),
            pri_res=jnp.where(res.ok, res.viol.astype(sol.pri_res.dtype),
                              sol.pri_res),
            converged=sol.converged | res.ok,
        )

    def _solve(self, q: Array, lb_s: Array, ub_s: Array,
               A_d: Array, lb_d: Array, ub_d: Array,
               x0: Optional[Array] = None) -> StructuredSolution:
        # full-f32 matmuls: at 'default' precision these batched GEMMs run
        # as multi-pass bf16 on the MXU, which corrupts the Woodbury solve
        cfg = self.cfg
        B, n = q.shape
        dt = q.dtype
        D, E_s = self.D, self.E_s

        # scale into equilibrated coordinates
        qb = (q * D[None, :]) * self.gamma                       # [B, n]
        lbs = jnp.maximum(lb_s, -BIG) * E_s[None, :]
        ubs = jnp.minimum(ub_s, BIG) * E_s[None, :]
        # per-row normalization of the dynamic rows (after column scaling)
        Ad = A_d * D[None, None, :]
        row_norm = jnp.max(jnp.abs(Ad), axis=-1)                 # [B, m_d]
        e_d = jnp.where(row_norm > 1e-10, 1.0 / jnp.sqrt(row_norm), 1.0)
        Ad = Ad * e_d[..., None]
        lbd = jnp.maximum(lb_d, -BIG) * e_d
        ubd = jnp.minimum(ub_d, BIG) * e_d
        inactive_d = (lb_d <= -BIG / 2) & (ub_d >= BIG / 2)
        rho_d = jnp.where(inactive_d, 1e-12, self.rho_d).astype(dt)  # [B, m_d]

        # Woodbury precompute (per problem, once per solve)
        # W = Ms_inv @ Ad' : [B, n, m_d]
        W = jnp.einsum("ij,bdj->bid", self.Ms_inv, Ad, preferred_element_type=dt)
        # C = diag(1/rho_d) + Ad Ms_inv Ad' : [B, m_d, m_d]
        C = jnp.einsum("bdj,bje->bde", Ad, W, preferred_element_type=dt) \
            + jnp.einsum("bd,de->bde", 1.0 / rho_d, jnp.eye(self.m_d, dtype=dt))
        C_chol = jnp.linalg.cholesky(C)

        def msolve(RHS_T):
            """Apply M_b^{-1} to a batch of right-hand sides.

            RHS_T [n, B] transposed layout; returns [n, B].
            """
            S = self.Ms_inv @ RHS_T                              # [n,B] shared MXU
            t = jnp.einsum("bdj,jb->bd", Ad, S)                  # [B, m_d]
            u = jax.scipy.linalg.cho_solve(
                (C_chol, True), t[..., None])[..., 0]            # [B, m_d]
            corr = jnp.einsum("bid,bd->bi", W, u)                # [B, n]
            return S - corr.T

        # transposed iteration state
        x = (x0 / D if x0 is not None else jnp.zeros_like(q)).T * 1.0  # [n, B]
        zs = jnp.clip((self.A_sb @ x).T, lbs, ubs)               # [B, m_s]
        zd = jnp.clip(jnp.einsum("bdj,jb->bd", Ad, x), lbd, ubd)
        ys = jnp.zeros_like(zs)
        yd = jnp.zeros_like(zd)

        rho_s = self.rho_s

        def iteration(carry, _):
            x, zs, zd, ys, yd = carry
            # rhs = sigma x - q + As'(rho_s zs - ys) + Ad'(rho_d zd - yd)
            rs = (rho_s[None, :] * zs - ys)                      # [B, m_s]
            rd = (rho_d * zd - yd)                               # [B, m_d]
            RHS = cfg.sigma * x - qb.T + self.A_sb.T @ rs.T \
                + jnp.einsum("bdj,bd->bj", Ad, rd).T             # [n, B]
            xt = msolve(RHS)
            zAs = (self.A_sb @ xt).T                             # [B, m_s]
            zAd = jnp.einsum("bdj,jb->bd", Ad, xt)
            x_new = cfg.alpha * xt + (1 - cfg.alpha) * x
            zs_h = cfg.alpha * zAs + (1 - cfg.alpha) * zs + ys / rho_s[None, :]
            zd_h = cfg.alpha * zAd + (1 - cfg.alpha) * zd + yd / rho_d
            zs_new = jnp.clip(zs_h, lbs, ubs)
            zd_new = jnp.clip(zd_h, lbd, ubd)
            ys_new = ys + rho_s[None, :] * (cfg.alpha * zAs + (1 - cfg.alpha) * zs - zs_new)
            yd_new = yd + rho_d * (cfg.alpha * zAd + (1 - cfg.alpha) * zd - zd_new)
            return (x_new, zs_new, zd_new, ys_new, yd_new), None

        use_pallas = cfg.use_pallas
        if use_pallas is None:
            # any real-TPU backend (incl. the remote 'axon' plugin); the
            # fused kernel needs f32 state. The kernel's per-lane Cholesky
            # substitutions are an O(m_d^2) unroll — past ~32 dynamic rows
            # (the FoV flagship has m_d ~ 84) the body bloats and VMEM
            # blocks shrink below MXU-efficient widths, so the XLA scan
            # path (whose per-iteration einsums stay large and batched)
            # wins there.
            use_pallas = (jax.default_backend() not in ("cpu", "gpu")
                          and dt == jnp.float32 and self.m_d <= 32)
        if use_pallas:
            from mpc_cbf_tpu.ops.qp.pallas_admm import structured_admm_iterations

            x_bf, _, _ = structured_admm_iterations(
                self.Ms_inv, self.A_sb, rho_s, qb, lbs, ubs, Ad, lbd, ubd,
                rho_d, W, C_chol, x.T,
                iters=cfg.iters, sigma=cfg.sigma, alpha=cfg.alpha,
                block=cfg.pallas_block, interpret=cfg.pallas_interpret)
            x = x_bf.T
        else:
            (x, zs, zd, ys, yd), _ = jax.lax.scan(
                iteration, (x, zs, zd, ys, yd), None, length=cfg.iters
            )

        # unscale; primal residual in scaled (row-equilibrated) coordinates,
        # which is the meaningful relative measure
        x_out = (D[:, None] * x).T                               # [B, n]
        As_x = (self.A_sb @ x).T
        Ad_x = jnp.einsum("bdj,jb->bd", Ad, x)
        viol_s = jnp.abs(As_x - jnp.clip(As_x, lbs, ubs))
        viol_d = jnp.abs(Ad_x - jnp.clip(Ad_x, lbd, ubd))
        # per-row relative violation: a 10 m/s^2 miss on a tight row must not
        # be excused by some other row's large magnitude
        rel_s = jnp.max(viol_s / jnp.maximum(jnp.abs(As_x), 1.0), axis=-1)
        rel_d = jnp.max(viol_d / jnp.maximum(jnp.abs(Ad_x), 1.0), axis=-1)
        pri = jnp.maximum(jnp.max(viol_s, axis=-1), jnp.max(viol_d, axis=-1))
        rel = jnp.maximum(rel_s, rel_d)
        return StructuredSolution(
            z=x_out,
            pri_res=pri,
            converged=(rel < cfg.eps_pri) & jnp.all(jnp.isfinite(x_out), axis=-1),
        )
