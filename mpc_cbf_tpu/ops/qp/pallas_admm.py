"""Fused Pallas TPU kernel for the structured ADMM iteration loop.

The structure-exploiting solver (``ops/qp/structured.py``) iterates ~200
times over tiny tensors: a [n,n]x[n,B] MXU matmul plus a handful of
per-lane VPU contractions. Run as a ``lax.scan``, every iteration is its
own fusion with HBM round-trips for the full solver state — hundreds of
kernel launches per solve. This kernel fuses the ENTIRE loop: one launch,
all state (x, z_s, z_d, y_s, y_d) resident in VMEM for a block of batch
lanes, shared operators (M_s^{-1}, A_s) loaded once.

Layout: lanes = batch (last dim, 128-aligned blocks), sublanes = the
problem dimensions (n, m_s, m_d — padded by Mosaic as needed). The shared
matmuls hit the MXU; the per-lane dynamic-row algebra (A_d apply and the
folded Woodbury correction WK — its inner inverse is constant across
iterations, precomputed in structured.py) runs elementwise on the VPU
across lanes.

Numerical semantics match ``StructuredQPOperator._solve``'s scan body
exactly (same update order, same over-relaxation); equality is asserted
in tests/test_pallas_admm.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ms_inv_ref, a_s_ref, rho_s_ref,
            qb_ref, lbs_ref, ubs_ref,
            ad_ref, lbd_ref, ubd_ref, rho_d_ref,
            wk_ref, x0_ref, zs0_ref, zd0_ref, ys0_ref, yd0_ref,
            x_out, zs_out, zd_out, ys_out, yd_out,
            *, iters: int, sigma: float, alpha: float):
    f32 = jnp.float32
    dot = functools.partial(jax.lax.dot_general, preferred_element_type=f32)

    Ms_inv = ms_inv_ref[:]            # [n, n]
    A_s = a_s_ref[:]                  # [m_s, n]
    rho_s = rho_s_ref[:]              # [m_s, 1] (broadcasts over lanes)
    qb = qb_ref[:]                    # [n, Bb]
    lbs, ubs = lbs_ref[:], ubs_ref[:]  # [m_s, Bb]
    Ad = ad_ref[:]                    # [m_d, n, Bb]
    lbd, ubd = lbd_ref[:], ubd_ref[:]  # [m_d, Bb]
    rho_d = rho_d_ref[:]              # [m_d, Bb]
    WK = wk_ref[:]                    # [n, m_d, Bb] folded Woodbury solve

    def ad_apply(v):                  # [n, Bb] -> [m_d, Bb]
        return jnp.sum(Ad * v[None, :, :], axis=1)

    def adT_apply(r):                 # [m_d, Bb] -> [n, Bb]
        return jnp.sum(Ad * r[:, None, :], axis=0)

    def msolve(rhs):                  # [n, Bb] -> [n, Bb] (Woodbury)
        S = dot(Ms_inv, rhs, (((1,), (0,)), ((), ())))
        t = ad_apply(S)
        corr = jnp.sum(WK * t[None, :, :], axis=1)  # contract m_d -> [n, Bb]
        return S - corr

    X = x0_ref[:]
    ZS = zs0_ref[:]
    ZD = zd0_ref[:]
    YS = ys0_ref[:]
    YD = yd0_ref[:]

    def body(_, carry):
        X, ZS, ZD, YS, YD = carry
        rs = rho_s * ZS - YS
        rd = rho_d * ZD - YD
        RHS = sigma * X - qb \
            + dot(A_s, rs, (((0,), (0,)), ((), ()))) \
            + adT_apply(rd)
        XT = msolve(RHS)
        zAs = dot(A_s, XT, (((1,), (0,)), ((), ())))
        zAd = ad_apply(XT)
        X_new = alpha * XT + (1.0 - alpha) * X
        zs_h = alpha * zAs + (1.0 - alpha) * ZS + YS / rho_s
        zd_h = alpha * zAd + (1.0 - alpha) * ZD + YD / rho_d
        ZS_new = jnp.clip(zs_h, lbs, ubs)
        ZD_new = jnp.clip(zd_h, lbd, ubd)
        YS_new = YS + rho_s * (alpha * zAs + (1.0 - alpha) * ZS - ZS_new)
        YD_new = YD + rho_d * (alpha * zAd + (1.0 - alpha) * ZD - ZD_new)
        return X_new, ZS_new, ZD_new, YS_new, YD_new

    X, ZS, ZD, YS, YD = jax.lax.fori_loop(
        0, iters, body, (X, ZS, ZD, YS, YD))
    x_out[:] = X
    zs_out[:] = ZS
    zd_out[:] = ZD
    ys_out[:] = YS
    yd_out[:] = YD


def structured_admm_iterations(
    Ms_inv, A_sb, rho_s, qb, lbs, ubs, Ad, lbd, ubd, rho_d, WK,
    x0, zs0, zd0, ys0, yd0,
    *, iters: int, sigma: float, alpha: float,
    block: int = 256, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run the fused iteration loop. Batch-first inputs (as produced by
    StructuredQPOperator._solve after scaling):

      qb, x0 [B, n]; lbs, ubs, zs0, ys0 [B, m_s]; Ad [B, m_d, n]; lbd,
      ubd, rho_d, zd0, yd0 [B, m_d]; WK [B, n, m_d] (the folded constant
      Woodbury correction Ms_inv Ad' (R^-1 + Ad Ms_inv Ad')^-1); shared
      Ms_inv [n, n], A_sb [m_s, n], rho_s [m_s].

    Returns (x [B, n], zs, zd, ys, yd) — the full iteration state (scaled
    coordinates), so a rho-schedule phase can resume exactly where the
    previous phase stopped.
    """
    B, n = qb.shape
    m_s = A_sb.shape[0]
    m_d = Ad.shape[1]
    f32 = jnp.float32

    # VMEM-aware block clamp. Scoped-VMEM accounting per lane: every
    # blocked INPUT is double-buffered by the pipeline (2x), outputs and
    # the kernel's loop state/temporaries land once each. Calibrated
    # against a measured Mosaic scoped allocation: (n=36, m_s=126,
    # m_d=6, ys/yd warm-started i/o) needs 16.86 MB at 1024 lanes
    # (~16.5 KB/lane vs this formula's 12.1 KB — the 10 MB budget below
    # absorbs that remaining untracked overhead: 10 MB/12.1 KB -> 768
    # lanes -> ~12.7 MB actual, inside the 16 MB scoped limit).
    per_lane_bytes = 4 * (4 * n * m_d + 8 * n + 14 * m_s + 18 * m_d)
    vmem_budget = 10 * 1024 * 1024
    block_cap = max(128, (vmem_budget // per_lane_bytes) // 128 * 128)
    Bb = min(block, block_cap, max(128, 1 << (B - 1).bit_length()))
    B_pad = ((B + Bb - 1) // Bb) * Bb

    def pad_lane(a):
        """Pad the batch axis (axis 0) then move it last."""
        pad = [(0, B_pad - B)] + [(0, 0)] * (a.ndim - 1)
        a = jnp.pad(a.astype(f32), pad)
        return jnp.moveaxis(a, 0, -1)

    qbT = pad_lane(qb)                    # [n, B]
    lbsT, ubsT = pad_lane(lbs), pad_lane(ubs)
    AdT = pad_lane(Ad)                    # [m_d, n, B]
    lbdT, ubdT = pad_lane(lbd), pad_lane(ubd)
    # padded lanes: keep rho strictly positive (divisions inside)
    rho_dT = pad_lane(rho_d)
    lane_pad = jnp.arange(B_pad) >= B
    rho_dT = jnp.where(lane_pad[None, :], 1.0, rho_dT)
    WKT = pad_lane(WK)                    # [n, m_d, B] (zeros fine when padded)
    x0T = pad_lane(x0)
    zs0T, ys0T = pad_lane(zs0), pad_lane(ys0)
    zd0T, yd0T = pad_lane(zd0), pad_lane(yd0)

    grid = (B_pad // Bb,)
    vm = pltpu.VMEM

    def lane_spec(*lead):
        nd = len(lead)
        return pl.BlockSpec((*lead, Bb), lambda i: (0,) * nd + (i,),
                            memory_space=vm)

    def shared_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=vm)

    kern = functools.partial(_kernel, iters=iters, sigma=float(sigma),
                             alpha=float(alpha))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            shared_spec((n, n)),          # Ms_inv
            shared_spec((m_s, n)),        # A_sb
            shared_spec((m_s, 1)),        # rho_s
            lane_spec(n),                 # qbT
            lane_spec(m_s), lane_spec(m_s),
            lane_spec(m_d, n),            # AdT
            lane_spec(m_d), lane_spec(m_d), lane_spec(m_d),
            lane_spec(n, m_d),            # WKT
            lane_spec(n),                 # x0T
            lane_spec(m_s), lane_spec(m_d),   # zs0T, zd0T
            lane_spec(m_s), lane_spec(m_d),   # ys0T, yd0T
        ],
        out_specs=[lane_spec(n), lane_spec(m_s), lane_spec(m_d),
                   lane_spec(m_s), lane_spec(m_d)],
        out_shape=[
            jax.ShapeDtypeStruct((n, B_pad), f32),
            jax.ShapeDtypeStruct((m_s, B_pad), f32),
            jax.ShapeDtypeStruct((m_d, B_pad), f32),
            jax.ShapeDtypeStruct((m_s, B_pad), f32),
            jax.ShapeDtypeStruct((m_d, B_pad), f32),
        ],
        interpret=interpret,
    )(Ms_inv.astype(f32), A_sb.astype(f32),
      rho_s.astype(f32).reshape(m_s, 1),
      qbT, lbsT, ubsT, AdT, lbdT, ubdT, rho_dT, WKT,
      x0T, zs0T, zd0T, ys0T, yd0T)

    x, zs, zd, ys, yd = (jnp.moveaxis(o, -1, 0)[:B] for o in out)
    return x, zs, zd, ys, yd
