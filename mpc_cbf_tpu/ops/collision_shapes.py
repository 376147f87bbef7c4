"""Collision shapes + aligned-box geometry helpers.

Reference parity:
- ``math/include/math/collision_shapes/CollisionShape.h:10-77``
  (abstract Type / convexHullPoints / boundingBox / inflate)
- ``math/include/math/collision_shapes/AlignedBoxCollisionShape.h:8-45``
- ``math/src/Helpers.cpp``: cornerPoints, snapHyperplane (:141-148),
  boundingHyperplanes (:150-163), bufferAlignedBox (:39-43),
  linearInterpolate (:165-170)

Shapes are static (config-time) objects; their geometry queries are
branch-free jnp over the last axis so they vmap/jit — positions may carry
leading batch axes. An aligned box is represented as the pair
``(box_min, box_max)`` of (DIM,) arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from mpc_cbf_tpu.types import Array


def corner_points(box_min: Array, box_max: Array) -> Array:
    """All 2^DIM corners of an aligned box: [2^DIM, DIM]
    (math::cornerPoints, Helpers.cpp)."""
    box_min = jnp.asarray(box_min)
    box_max = jnp.asarray(box_max)
    dim = box_min.shape[-1]
    # static corner-selection mask: bit d of corner c picks min/max along d
    sel = np.array(
        [[(c >> d) & 1 for d in range(dim)] for c in range(2**dim)], dtype=bool
    )
    return jnp.where(jnp.asarray(sel), box_max[..., None, :], box_min[..., None, :])


def snap_hyperplane(normal: Array, offset: Array, points: Array) -> Array:
    """Shift a hyperplane until it touches the closest of ``points``
    (Helpers.cpp:141-148): offset' = offset - min_i signedDistance(p_i),
    signedDistance(p) = normal . p + offset. Returns the new offset.

    points: [..., P, DIM]; normal: [..., DIM]; offset: [...].
    """
    sd = jnp.sum(points * normal[..., None, :], axis=-1) + offset[..., None]
    return offset - jnp.min(sd, axis=-1)


def bounding_hyperplanes(box_min: Array, box_max: Array) -> Tuple[Array, Array]:
    """The 2*DIM hyperplanes bounding an aligned box, as
    (normals [2*DIM, DIM], offsets [2*DIM]) with normal . x + offset <= 0
    inside (Helpers.cpp:150-163): (+e_d, -max_d) and (-e_d, +min_d)."""
    box_min = jnp.asarray(box_min)
    box_max = jnp.asarray(box_max)
    dim = box_min.shape[-1]
    eye = jnp.eye(dim, dtype=box_min.dtype)
    normals = jnp.concatenate([eye, -eye], axis=0)
    offsets = jnp.concatenate([-box_max, box_min], axis=-1)
    return normals, offsets


def buffer_aligned_box(box_min: Array, box_max: Array,
                       zero_min: Array, zero_max: Array) -> Tuple[Array, Array]:
    """Erode ``box`` by a shape-at-zero so that positions inside the result
    keep the translated shape inside the original box
    (bufferAlignedBox, Helpers.cpp:39-43)."""
    return box_min - jnp.asarray(zero_min), box_max - jnp.asarray(zero_max)


def linear_interpolate(t1: Array, p1: Array, t2: Array, p2: Array, t: Array) -> Array:
    """Point on the line through (t1, p1), (t2, p2) at parameter t
    (Helpers.cpp:165-170)."""
    ratio = (t - t1) / (t2 - t1)
    return p1 + ratio[..., None] * (p2 - p1)


@dataclasses.dataclass(frozen=True)
class AlignedBoxCollisionShape:
    """Axis-aligned-box collision shape at zero, translated by position
    (AlignedBoxCollisionShape.h:8-45). ``zero_min``/``zero_max`` are numpy
    (DIM,) vectors fixed at build time.
    """

    zero_min: np.ndarray
    zero_max: np.ndarray

    TYPE = "ALIGNED_BOX"  # CollisionShape::Type::ALIGNED_BOX

    @classmethod
    def from_half_extents(cls, half_extents) -> "AlignedBoxCollisionShape":
        h = np.asarray(half_extents, dtype=float)
        return cls(zero_min=-h, zero_max=h)

    @property
    def half_extents(self) -> np.ndarray:
        return (self.zero_max - self.zero_min) / 2.0

    def convex_hull_points(self, position: Array) -> Array:
        """[2^DIM, DIM] corners of the shape translated to ``position``
        (Minkowski sum semantics of the reference)."""
        mn, mx = self.bounding_box(position)
        return corner_points(mn, mx)

    def bounding_box(self, position: Array) -> Tuple[Array, Array]:
        """(min, max) of the shape at ``position``."""
        position = jnp.asarray(position)
        dt = position.dtype
        return (position + jnp.asarray(self.zero_min, dt),
                position + jnp.asarray(self.zero_max, dt))

    def inflate(self, amount: float) -> "AlignedBoxCollisionShape":
        """Grow by ``amount`` in every primary direction
        (AlignedBoxCollisionShape.h:27-34)."""
        return AlignedBoxCollisionShape(
            zero_min=self.zero_min - amount, zero_max=self.zero_max + amount
        )
