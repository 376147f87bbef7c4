"""Scratch: f32 ADMM entry + f64 active-set polish vs oracle."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
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
from mpc_cbf_tpu.ops.qp.polish import polish_dense, PolishConfig  # noqa: E402

B = 32
ctrl, op, qp, _ = _flagship_qps(B, seed=3)
x_ref, status = solve_oracle_batch(*(np.asarray(v) for v in
                                     (qp.P, qp.q, qp.A, qp.lb, qp.ub)))
assert (status == 0).all(), status

qp32 = jax.tree.map(lambda a: a.astype(jnp.float32), qp)
sol = solve_batch(qp32, ADMMConfig(iters=200))
U = np.asarray(op.U_basis)
u_ref = x_ref[:, :36] @ U.T
dev_f32 = np.abs(np.asarray(sol.z[:, :36], np.float64) @ U.T - u_ref).max()
print("f32 entry deviation:", dev_f32)

for rounds in (2, 4, 6, 8):
    res = polish_dense(qp, sol.z, PolishConfig(rounds=rounds))
    dev = np.abs(np.asarray(res.z[:, :36]) @ U.T - u_ref).max()
    per_lane = np.abs(np.asarray(res.z[:, :36]) @ U.T - u_ref).max(axis=1)
    print(f"rounds={rounds}: ok={int(np.sum(np.asarray(res.ok)))}/{B} "
          f"dev={dev:.3e} viol_max={float(np.max(np.asarray(res.viol))):.2e} "
          f"stat_max={float(np.max(np.asarray(res.stat))):.2e} "
          f"worst_lane_dev={per_lane.max():.3e}")
    bad = np.argsort(-per_lane)[:3]
    print("   worst lanes:", [(int(i), float(per_lane[i]), bool(np.asarray(res.ok)[i])) for i in bad])
