"""Find the gap between solver-only lanes/s and bench.py end-to-end
solves/s for the hybrid certified path.

Round-4 bench: fov+hybrid = 589 solves/s at batch 8192. Solver-only
measurements (scripts/calibrate_tail.py): entry 16.3k lanes/s + tail-10
1.47k lanes/s => predicted ~1.35k solves/s end-to-end. Factor ~2.3
unexplained. Suspects: (a) QP assembly under jax_enable_x64 promoting
the CBF autodiff chain to emulated f64, (b) batch-8192 behavior vs 2048,
(c) the warm x0/duals plumbing.

Usage: python scripts/profile_e2e.py [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/scripts")
    from _fov_ensemble import build_fov_ensemble
    from mpc_cbf_tpu.ops.qp.ipm import HybridIPM, HybridIPMConfig

    ctrl, args0, iter1_args = build_fov_ensemble(batch)
    P, A_s, eq_mask = ctrl.static_parts()
    m_d = ctrl.m_dynamic

    def bench_time(fn, label, reps=3):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(fn())
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:40s} {dt*1e3:9.1f} ms", flush=True)
        return dt

    # 1. assembly only (iter-0 rows), jitted — is the autodiff CBF row
    #    build expensive under x64?
    H = ctrl.impc.cbf_horizon

    # rebuild inputs for assembly timing (mirror _fov_ensemble internals)
    from mpc_cbf_tpu.types import State
    rng = np.random.default_rng(0)
    N = 7
    f32 = jnp.float32
    ang = rng.uniform(0, 2 * np.pi, (batch, N))
    rad = rng.uniform(1.0, 3.5, (batch, N))
    cov = np.broadcast_to(np.array([0.05, 0.0, 0.05]), (batch, N, 3))
    nbr = jnp.asarray(np.concatenate([
        (rad * np.cos(ang))[..., None], (rad * np.sin(ang))[..., None],
        cov], axis=-1), f32)
    pos = jnp.asarray(rng.normal(0, 0.3, (batch, 3)), f32)
    vel = jnp.asarray(rng.normal(0, 0.5, (batch, 3)), f32)
    mask = jnp.ones((batch, N), bool)
    current = State(pos=pos, vel=vel)
    x_now = current.stacked
    pred0 = jnp.broadcast_to(x_now[:, None, :], (batch, H, x_now.shape[-1]))
    active0 = jnp.arange(H) == 0

    @jax.jit
    def assemble():
        return jax.vmap(
            lambda cp, cv, blob, m, pr: ctrl.dynamic_rows(
                State(pos=cp, vel=cv), blob, m, pr, active0)
        )(current.pos, current.vel, nbr, mask, pred0)

    bench_time(assemble, "assembly (dynamic rows, iter-0)")

    # 2. hybrid solve alone at this batch
    hyb = HybridIPM(P, A_s, eq_mask, m_d, HybridIPMConfig())
    bench_time(lambda: hyb.solve(*args0).z, "hybrid solve (iter-0 args)")

    # 3. one jit wrapping assembly + solve (bench-style fusion)
    @jax.jit
    def fused():
        A_d, lb_d, ub_d = jax.vmap(
            lambda cp, cv, blob, m, pr: ctrl.dynamic_rows(
                State(pos=cp, vel=cv), blob, m, pr, active0)
        )(current.pos, current.vel, nbr, mask, pred0)
        return hyb.solve(args0[0], args0[1], args0[2], A_d, lb_d, ub_d).z

    bench_time(fused, "fused assembly+hybrid (one jit)")

    # 4. iter-1 args + solve (the second IMPC iteration's full cost)
    sol0 = hyb.solve(*args0)
    a1 = iter1_args(sol0.z.astype(jnp.float32))
    jax.block_until_ready(a1[3])
    bench_time(lambda: hyb.solve(*a1).z, "hybrid solve (iter-1 args)")


if __name__ == "__main__":
    main()
