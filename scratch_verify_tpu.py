"""Verify drive: f32 structured ADMM + f64 polish on the REAL TPU.

Checks (1) solve_polished runs on the axon backend under x64, (2) the
polished controls match the native exact oracle <1e-3, (3) timings.
"""
import jax
jax.config.update("jax_enable_x64", True)

import time
import numpy as np
import jax.numpy as jnp

print("devices:", jax.devices())

from mpc_cbf_tpu.types import State
from mpc_cbf_tpu.ops.cbf import ConnectivityCBF
from mpc_cbf_tpu.ops.qp import ADMMConfig
from mpc_cbf_tpu.ops.qp.oracle import solve_oracle_batch
from mpc_cbf_tpu.ops.qp.structured import StructuredConfig
from mpc_cbf_tpu.controllers import (
    BezierParams, MPCParams, BezierMPCOperator, IMPCParams, ConnectivityIMPCCBF,
)
from mpc_cbf_tpu.controllers.mpc_cbf import StructuredIMPC

B, N = 256, 3
MPC = MPCParams()
f32 = jnp.float32
rng = np.random.default_rng(3)
op = BezierMPCOperator(BezierParams(), MPC, dim=3)
cbf = ConnectivityCBF(1.0, 4.0, jnp.asarray(MPC.v_min), jnp.asarray(MPC.v_max))
ctrl = ConnectivityIMPCCBF(op, cbf, IMPCParams(), N, solver=ADMMConfig(iters=200))
simpc = StructuredIMPC(ctrl, StructuredConfig(iters=200))

pos = jnp.asarray(rng.normal(0, 0.3, (B, 3)), f32)
vel = jnp.asarray(rng.normal(0, 0.5, (B, 3)), f32)
goals = jnp.asarray(rng.normal(0, 3.0, (B, 3)), f32)
refs = jnp.tile(goals[:, None, :], (1, MPC.k_hor, 1)).reshape(B, -1)
ang = rng.uniform(0, 2 * np.pi, (B, N))
rad = rng.uniform(2.0, 4.5, (B, N))
nbr_pos = np.stack([rad * np.cos(ang), rad * np.sin(ang), np.zeros_like(rad)], -1)
nbr_vel = rng.normal(0, 0.5, (B, N, 3))
blobs = jnp.asarray(np.concatenate([nbr_pos, nbr_vel], -1), f32)
mask = jnp.ones((B, N), bool)

st = State(pos=pos, vel=vel)
lb_s, ub_s = jax.vmap(ctrl.shared_bounds)(st)
x_now = jnp.concatenate([pos, vel], -1)
pred0 = jnp.broadcast_to(x_now[:, None, :], (B, 2, 6))
active0 = jnp.arange(2) == 0
A_d, lb_d, ub_d = jax.vmap(
    lambda p, v, nb, mk, pr: ctrl.dynamic_rows(State(pos=p, vel=v), nb, mk, pr, active0)
)(pos, vel, blobs, mask, pred0)
q = jax.vmap(op.linear_cost)(x_now, refs)

# oracle on host (assemble the dense QP in f64 numpy via ctrl.assemble)
qp = jax.vmap(lambda p, v, r, nb, mk: ctrl.assemble(
    State(pos=jnp.asarray(p, jnp.float64), vel=jnp.asarray(v, jnp.float64)),
    jnp.asarray(r, jnp.float64), jnp.asarray(nb, jnp.float64), mk,
    jnp.broadcast_to(jnp.concatenate([jnp.asarray(p, jnp.float64),
                                      jnp.asarray(v, jnp.float64)]), (2, 6)),
    active0))(pos, vel, refs, blobs, mask)
x_ref, status = solve_oracle_batch(*(np.asarray(v, np.float64) for v in
                                     (qp.P, qp.q, qp.A, qp.lb, qp.ub)))
print("oracle ok:", (status == 0).all())

t0 = time.perf_counter()
sol0 = simpc.op_qp.solve(q, lb_s, ub_s, A_d, lb_d, ub_d)
sol0.z.block_until_ready(); float(jnp.sum(sol0.z))
print(f"ADMM f32 compile+run: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
sol0 = simpc.op_qp.solve(q, lb_s, ub_s, A_d, lb_d, ub_d)
float(jnp.sum(sol0.z))
t_admm = time.perf_counter() - t0
U = np.asarray(op.U_basis)
u_ref = x_ref[:, :36] @ U.T
dev0 = np.abs(np.asarray(sol0.z[:, :36], np.float64) @ U.T - u_ref).max()
print(f"raw f32 ADMM: {t_admm*1e3:.1f} ms, dev={dev0:.2e}")

t0 = time.perf_counter()
sol = simpc.op_qp.solve_polished(q, lb_s, ub_s, A_d, lb_d, ub_d)
sol.z.block_until_ready(); float(jnp.sum(sol.z))
print(f"polished compile+run: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
sol = simpc.op_qp.solve_polished(q, lb_s, ub_s, A_d, lb_d, ub_d)
float(jnp.sum(sol.z))
t_pol = time.perf_counter() - t0
dev = np.abs(np.asarray(sol.z[:, :36], np.float64) @ U.T - u_ref).max()
ncert = int(np.sum(np.asarray(sol.converged)))
print(f"polished: {t_pol*1e3:.1f} ms total, dev={dev:.2e}, certified={ncert}/{B}")
print("PASS" if dev < 1e-3 and ncert == B else "FAIL")
