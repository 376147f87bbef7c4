"""Canonicalization helpers for dense batched QPs.

The reference assembles QPs by mutating a pointer-based ``qpcpp::Problem``
(Problem.h:131-196) then handing it to CPLEX. Here a QP is a fixed-shape
tensor tuple (see :class:`mpc_cbf_tpu.types.QPBatch`):

- variable box bounds become identity rows (CPLEX gets them as var bounds;
  an ADMM projection treats all rows uniformly),
- a variable number of constraints becomes a *static* maximum number of rows
  with inactive rows masked by (lb, ub) = (-BIG, +BIG) and zero coefficients,
- equality constraints are rows with lb == ub.

This is what makes one jitted program serve any neighbor count and makes the
whole assembly vmap over agents/scenarios.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mpc_cbf_tpu.types import BIG


def box_rows(n: int, lb, ub, dtype=jnp.float32):
    """Identity rows encoding lb <= z <= ub."""
    A = jnp.eye(n, dtype=dtype)
    return A, jnp.asarray(lb, dtype), jnp.asarray(ub, dtype)


def pad_rows(A, lb, ub, m_total: int):
    """Pad (A, lb, ub) with inactive rows up to m_total."""
    m = A.shape[-2]
    if m > m_total:
        raise ValueError(f"{m} rows exceed budget {m_total}")
    pad = m_total - m
    A_p = jnp.concatenate(
        [A, jnp.zeros((*A.shape[:-2], pad, A.shape[-1]), A.dtype)], axis=-2
    )
    lb_p = jnp.concatenate([lb, jnp.full((*lb.shape[:-1], pad), -BIG, lb.dtype)], axis=-1)
    ub_p = jnp.concatenate([ub, jnp.full((*ub.shape[:-1], pad), BIG, ub.dtype)], axis=-1)
    return A_p, lb_p, ub_p


def stack_qp(rows):
    """Concatenate a list of (A, lb, ub) row groups along the row axis."""
    As, lbs, ubs = zip(*rows)
    return (
        jnp.concatenate(As, axis=-2),
        jnp.concatenate(lbs, axis=-1),
        jnp.concatenate(ubs, axis=-1),
    )


def np_pad_rows(A: np.ndarray, lb: np.ndarray, ub: np.ndarray, m_total: int):
    """numpy variant of pad_rows for build-time constant blocks."""
    m, n = A.shape
    out_A = np.zeros((m_total, n))
    out_lb = np.full(m_total, -BIG)
    out_ub = np.full(m_total, BIG)
    out_A[:m] = A
    out_lb[:m] = lb
    out_ub[:m] = ub
    return out_A, out_lb, out_ub
