"""Tune the f32 IPM entry iteration count for the raw production path.

entry30 == entry22 state-wise (lanes freeze at the f32 floor), so the
question is how far BELOW 22 the usable rate holds. Measures iters in
{14, 16, 18, 20, 22} on the fov flagship ensemble: usable rate
(pri < USABLE_PRI_EPS), throughput, and feasibility margins, on BOTH
IMPC iterations' problem families.

Usage: python scripts/tune_entry_iters.py [batch]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/scripts")
    from _fov_ensemble import build_fov_ensemble
    from mpc_cbf_tpu.ops.qp.ipm import StructuredIPM, IPM_F32_ENTRY

    ctrl, args0, iter1_args = build_fov_ensemble(batch)
    P, A_s, eq_mask = ctrl.static_parts()
    m_d = ctrl.m_dynamic
    eps = ctrl.USABLE_PRI_EPS

    base = StructuredIPM(P, A_s, eq_mask, m_d, IPM_F32_ENTRY)
    s0 = base.solve(*args0)
    args1 = iter1_args(s0.z)

    for it in (22, 20, 18, 16, 14):
        cfg = dataclasses.replace(IPM_F32_ENTRY, iters=it)
        ipm = StructuredIPM(P, A_s, eq_mask, m_d, cfg)
        sol0 = ipm.solve(*args0)
        jax.block_until_ready(sol0.z)
        t0 = time.perf_counter()
        for _ in range(3):
            o = ipm.solve(*args0)
            float(jnp.sum(o.z))
        t = (time.perf_counter() - t0) / 3
        sol1 = ipm.solve(*args1)
        jax.block_until_ready(sol1.z)
        u0 = float(np.mean(np.asarray(sol0.pri_res) < eps))
        u1 = float(np.mean(np.asarray(sol1.pri_res) < eps))
        p999_0 = float(np.percentile(np.asarray(sol0.pri_res), 99.9))
        print(f"iters={it:2d}  {t*1e3:7.1f} ms  {batch/t:7.0f} lanes/s  "
              f"usable i0={u0:.4f} i1={u1:.4f}  pri p99.9={p999_0:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
