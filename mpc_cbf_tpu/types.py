"""Core pytree types.

The reference's ``model::State`` (``DoubleIntegrator.h:19-27``) is a pair of
Eigen vectors; here states are batched jnp arrays so a single program serves
``[..., DIM]`` for one robot, ``[A, DIM]`` for an agent axis and
``[S, A, DIM]`` for a scenario axis — all transformations (vmap / scan /
shard_map) operate on the same dataclasses.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


def _pytree(cls):
    """Register a dataclass as a JAX pytree node."""
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in fields), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree
@dataclasses.dataclass
class State:
    """Double-integrator state: position-like block and velocity-like block.

    pos: [..., DIM]  (for DIM=3 the layout is [px, py, yaw])
    vel: [..., DIM]  ([vx, vy, omega])
    """

    pos: Array
    vel: Array

    @property
    def stacked(self) -> Array:
        """[..., 2*DIM] concatenation [pos, vel] (reference x0 layout)."""
        return jnp.concatenate([self.pos, self.vel], axis=-1)

    @classmethod
    def from_stacked(cls, x: Array) -> "State":
        dim = x.shape[-1] // 2
        return cls(pos=x[..., :dim], vel=x[..., dim:])


@_pytree
@dataclasses.dataclass
class QPBatch:
    """A batch of dense box-and-row constrained QPs.

    minimize    0.5 z' P z + q' z
    subject to  lb <= A z <= ub          (row constraints; equality if lb==ub)

    Shapes (leading batch axes allowed):
      P:  [..., n, n]   symmetric PSD
      q:  [..., n]
      A:  [..., m, n]   zero rows = padding (masked out by lb=-BIG, ub=+BIG)
      lb: [..., m]
      ub: [..., m]

    Variable box bounds are expected to be encoded as identity rows in A so
    that the solver sees a single uniform projection (reference splits them
    into qpcpp Variable min/max; see ops/qp/canon.py).
    """

    P: Array
    q: Array
    A: Array
    lb: Array
    ub: Array

    @property
    def n(self) -> int:
        return self.q.shape[-1]

    @property
    def m(self) -> int:
        return self.lb.shape[-1]


@_pytree
@dataclasses.dataclass
class QPSolution:
    """Solution of a QPBatch solve.

    z:        [..., n] primal solution
    y:        [..., m] dual solution (row constraints)
    pri_res:  [...]    final primal residual (inf-norm)
    dua_res:  [...]    final dual residual (inf-norm)
    converged:[...]    bool, residuals under tolerance
    """

    z: Array
    y: Array
    pri_res: Array
    dua_res: Array
    converged: Array


# A sentinel "infinite" bound. Large but well inside float32 range so that
# arithmetic (e.g. ub + slack) stays finite.
BIG = 1e20
BIG_F32 = 3e18


def default_dtype() -> Any:
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
