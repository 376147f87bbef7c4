"""Hard-margin SVM separating hyperplanes via the batched QP solver.

Reference parity: ``separating_hyperplanes/src/SVM.cpp:9-79`` — finds the
max-margin hyperplane between two point sets by solving
    min ||w||^2  s.t.  w.x_i + b <= -1 (first set), w.x_j + b >= +1 (second)
with CPLEX. Here the same QP runs through the batched ADMM solver, vmapped
over pairs — the reference's per-pair CPLEX calls become one lockstep batch.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from mpc_cbf_tpu.types import QPBatch, BIG
from mpc_cbf_tpu.ops.qp import solve_batch, ADMMConfig


def hard_margin_svm(first_points, second_points,
                    cfg: ADMMConfig = ADMMConfig(iters=1000)) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(normal [dim], offset) with normal.x + offset <= -1 on the first set.

    first_points [N1, dim], second_points [N2, dim]. Batched leading axes
    are supported (vmap externally for point sets of equal size).
    """
    first_points = jnp.asarray(first_points)
    second_points = jnp.asarray(second_points)
    dim = first_points.shape[-1]
    n = dim + 1  # w, b

    # cost: min w'w  (z'Qz convention with Q = diag(1...1, 0) -> P = 2Q)
    P = 2.0 * jnp.diag(jnp.concatenate([jnp.ones(dim), jnp.zeros(1)]))
    q = jnp.zeros(n)

    A1 = jnp.concatenate([first_points, jnp.ones((*first_points.shape[:-1], 1))], axis=-1)
    A2 = jnp.concatenate([second_points, jnp.ones((*second_points.shape[:-1], 1))], axis=-1)
    A = jnp.concatenate([A1, A2], axis=-2)
    m1 = first_points.shape[-2]
    m2 = second_points.shape[-2]
    lb = jnp.concatenate([jnp.full(m1, -BIG), jnp.full(m2, 1.0)])
    ub = jnp.concatenate([jnp.full(m1, -1.0), jnp.full(m2, BIG)])

    sol = solve_batch(QPBatch(P=P.astype(A.dtype), q=q.astype(A.dtype), A=A,
                              lb=lb.astype(A.dtype), ub=ub.astype(A.dtype)), cfg)
    return sol.z[..., :dim], sol.z[..., dim]
