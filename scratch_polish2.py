"""Scratch: per-round diagnostics for the polish on the worst lane."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge
    xla_bridge._clear_backends()
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, "tests")
from test_oracle_deviation import _flagship_qps  # noqa: E402
from mpc_cbf_tpu.ops.qp import ADMMConfig, solve_batch  # noqa: E402
from mpc_cbf_tpu.ops.qp.oracle import solve_oracle_batch  # noqa: E402

B = 32
ctrl, op, qp, _ = _flagship_qps(B, seed=3)
x_ref, status = solve_oracle_batch(*(np.asarray(v) for v in
                                     (qp.P, qp.q, qp.A, qp.lb, qp.ub)))
qp32 = jax.tree.map(lambda a: a.astype(jnp.float32), qp)
sol = solve_batch(qp32, ADMMConfig(iters=200))
U = np.asarray(op.U_basis)
u_ref = x_ref[:, :36] @ U.T

lane = 28
P = np.asarray(qp.P[lane], np.float64)
q = np.asarray(qp.q[lane], np.float64)
A = np.asarray(qp.A[lane], np.float64)
lb = np.asarray(qp.lb[lane], np.float64)
ub = np.asarray(qp.ub[lane], np.float64)
x0 = np.asarray(sol.z[lane], np.float64)
xr = x_ref[lane]
n, m = q.shape[0], lb.shape[0]

BIGV = 1e20
bscale = np.maximum(1.0, np.maximum(np.abs(np.clip(lb, -1e9, None)),
                                    np.abs(np.clip(ub, None, 1e9))))
eq = (ub - lb) <= 1e-9 * bscale
masked = (lb <= -BIGV / 2) & (ub >= BIGV / 2)
rn = np.maximum(np.abs(A).max(axis=1), 1e-12)

Ax_r = A @ xr
d_r = np.minimum(Ax_r - lb, ub - Ax_r)
act_oracle = (~masked) & (~eq) & (d_r <= 1e-7 * bscale)
print("oracle active ineq rows:", np.nonzero(act_oracle)[0], "n_eq:", eq.sum())

Ax0 = A @ x0
d0 = np.minimum(Ax0 - lb, ub - Ax0)
act0 = (~masked) & (~eq) & (d0 <= 1e-3 * bscale)
print("f32-init active ineq rows:", np.nonzero(act0)[0])
print("f32 deviation:", np.abs((x0[:36] - xr[:36]) @ U.T).max())

# plain numpy replica of the round loop
active = act0.copy()
x = x0.copy()
sigma, delta = 1e-9, 1e-11
for r in range(10):
    pin = eq | active
    idxp = np.nonzero(pin)[0]
    G = A[idxp] / rn[idxp, None]
    b = np.where((ub[idxp] - A[idxp] @ x) < (A[idxp] @ x - lb[idxp]),
                 ub[idxp], lb[idxp]) / rn[idxp]
    k = len(idxp)
    K = np.zeros((n + k, n + k))
    K[:n, :n] = P + sigma * np.eye(n)
    K[:n, n:] = G.T
    K[n:, :n] = G
    K[n:, n:] = -delta * np.eye(k)
    rhs = np.concatenate([-q, b])
    solk = np.linalg.solve(K, rhs)
    x_new, y = solk[:n], solk[n:]
    side_hi = (ub[idxp] - A[idxp] @ x) < (A[idxp] @ x - lb[idxp])
    wrong = (~eq[idxp]) & np.where(side_hi, y < -1e-9, y > 1e-9)
    Axn = A @ x_new
    dn = np.minimum(Axn - lb, ub - Axn) / bscale
    active_new = np.zeros(m, bool)
    active_new[idxp] = (~eq[idxp]) & ~wrong
    active_new |= (dn < -1e-9) & ~eq & ~masked
    dev = np.abs((x_new[:36] - xr[:36]) @ U.T).max()
    print(f"r{r}: pinned={k} drops={wrong.sum()} adds={(dn < -1e-9).sum()} "
          f"viol={max(0, -dn.min()):.2e} dev={dev:.3e} "
          f"act={sorted(np.nonzero(active_new)[0])}")
    x = x_new
    active = active_new
print("oracle act:", sorted(np.nonzero(act_oracle)[0]))
