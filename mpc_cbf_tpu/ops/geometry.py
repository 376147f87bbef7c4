"""Geometry primitives: separating hyperplanes, confidence ellipses, FOV.

Reference parity:
- Voronoi hyperplane: ``separating_hyperplanes/src/Voronoi.cpp:10-29``
- shiftHyperplane / collision-shape support:
  ``math/src/Helpers.cpp`` (shift by box support) +
  ``math/collision_shapes/AlignedBoxCollisionShape.h``
- distance to 90% confidence ellipse:
  ``mpc_cbf/src/controller/FovBezierIMPCCBF.cpp:226-291`` /
  ``math/src/Geometry.cpp:8-57`` (closestPointOnEllipse)
- insideFOV: ``math/src/Geometry.cpp:60-74``
- convertYawInRange / convertToClosestYaw: ``math/src/Geometry.cpp:76-86``,
  ``math/include/math/Geometry.h:77-104``

Everything is branch-free jnp (jnp.where instead of if/else) so it vmaps and
jits cleanly; the reference's Eigen::EigenSolver on the 2x2 covariance is
replaced by a closed-form symmetric 2x2 eigendecomposition.

All functions operate on the last axis and broadcast over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpc_cbf_tpu.types import Array


def voronoi_hyperplane(p_self: Array, p_other: Array, eps: float = 1e-12):
    """Perpendicular-bisector hyperplane (normal, offset) with
    normal . x + offset <= 0 on the side of p_self.

    Matches Voronoi.cpp:10-29: normal is the unit vector from self to other,
    offset = -normal . midpoint.
    """
    d = p_other - p_self
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    normal = d / jnp.maximum(norm, eps)
    mid = 0.5 * (p_self + p_other)
    offset = -jnp.sum(normal * mid, axis=-1)
    return normal, offset


def shift_hyperplane_for_box(normal: Array, offset: Array, box_half_extents: Array) -> Array:
    """Shift offset so a box (half-extents, centered at its position) on the
    negative side keeps the whole box on the negative side of the original.

    The support of an axis-aligned box in direction n is sum(|n| * half_ext),
    equivalent to the reference's corner-point max (math::shiftHyperplane).
    Returns the new offset (normal unchanged).
    """
    support = jnp.sum(jnp.abs(normal) * box_half_extents, axis=-1)
    return offset + support


def eigh_2x2(cov: Array):
    """Closed-form eigendecomposition of a symmetric 2x2 matrix.

    Returns (eigvals [.., 2] ascending, eigvecs [.., 2, 2] with columns as
    eigenvectors). Replaces Eigen::EigenSolver on covariance blocks.
    """
    a = cov[..., 0, 0]
    b = cov[..., 0, 1]
    c = cov[..., 1, 1]
    tr = a + c
    disc = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    lam1 = 0.5 * tr - disc  # smaller
    lam2 = 0.5 * tr + disc  # larger
    # Eigenvector for lam2: (b, lam2 - a) unless degenerate.
    v2x = jnp.where(jnp.abs(b) > 1e-18, b, jnp.where(a >= c, 1.0, 0.0))
    v2y = jnp.where(jnp.abs(b) > 1e-18, lam2 - a, jnp.where(a >= c, 0.0, 1.0))
    n2 = jnp.sqrt(v2x * v2x + v2y * v2y)
    v2x, v2y = v2x / n2, v2y / n2
    # v1 orthogonal to v2
    v1x, v1y = -v2y, v2x
    vals = jnp.stack([lam1, lam2], axis=-1)
    vecs = jnp.stack(
        [jnp.stack([v1x, v2x], axis=-1), jnp.stack([v1y, v2y], axis=-1)], axis=-2
    )
    return vals, vecs


# 90% confidence interval scale for a 2-dof chi-square
# (FovBezierIMPCCBF.cpp:237-240).
CONF_90 = 4.605


def distance_to_ellipse(robot_xy: Array, mean_xy: Array, cov2: Array, s: float = CONF_90) -> Array:
    """Signed distance from robot to the s-scaled covariance ellipse.

    Negative when the robot is inside the ellipse; mirrors
    FovBezierIMPCCBF::distanceToEllipse (FovBezierIMPCCBF.cpp:226-291)
    including its approximation of the closest boundary point and the
    nan -> 5.0 and infinite-cov -> -5.0 fallbacks.
    """
    vals, vecs = eigh_2x2(cov2)
    # reference uses es.eigenvalues()(0)/(1) unordered, then swaps a/b and
    # picks the larger-eigenvalue column for theta; with our ordering
    # lam2 >= lam1 so a (major) = sqrt(s*lam2), b = sqrt(s*lam1).
    a = jnp.sqrt(jnp.maximum(s * vals[..., 1], 0.0))
    b = jnp.sqrt(jnp.maximum(s * vals[..., 0], 0.0))
    theta = jnp.arctan2(vecs[..., 1, 1], vecs[..., 0, 1])
    theta = jnp.where(theta < 0.0, theta + jnp.pi, theta)

    slope = jnp.arctan2(
        robot_xy[..., 1] - mean_xy[..., 1], robot_xy[..., 0] - mean_xy[..., 0]
    )
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cs, ss = jnp.cos(slope - theta), jnp.sin(slope - theta)
    x_n = mean_xy[..., 0] + a * cs * ct - b * ss * st
    y_n = mean_xy[..., 1] + a * cs * st + b * ss * ct

    dist = jnp.sqrt((x_n - robot_xy[..., 0]) ** 2 + (y_n - robot_xy[..., 1]) ** 2)
    dist = jnp.where(jnp.isnan(dist), 5.0, dist)

    d_center = jnp.linalg.norm(mean_xy - robot_xy, axis=-1)
    rng = jnp.sqrt((mean_xy[..., 0] - x_n) ** 2 + (mean_xy[..., 1] - y_n) ** 2)
    signed = jnp.where(d_center < rng, -dist, dist)
    # infinite covariance -> sensor lost the target: reference returns -5
    return jnp.where(jnp.isinf(cov2[..., 0, 0]), -5.0, signed)


def inside_fov(robot_pose: Array, target_xy: Array, fov: Array, rng: Array) -> Array:
    """Bool: target within the robot's field-of-view wedge and range.

    robot_pose [..., 3] = [x, y, yaw]. Matches math::insideFOV
    (Geometry.cpp:60-74).
    """
    yaw = robot_pose[..., 2]
    dx = target_xy[..., 0] - robot_pose[..., 0]
    dy = target_xy[..., 1] - robot_pose[..., 1]
    cx = jnp.cos(yaw) * dx + jnp.sin(yaw) * dy
    cy = -jnp.sin(yaw) * dx + jnp.cos(yaw) * dy
    dist = jnp.sqrt(cx * cx + cy * cy)
    angle = jnp.abs(jnp.arctan2(cy, cx))
    return (angle <= 0.5 * fov) & (dist <= rng)


def convert_yaw_in_range(yaw: Array) -> Array:
    """Wrap yaw into (-pi, pi] (Geometry.cpp:76-86)."""
    return jnp.where(yaw > jnp.pi, yaw - 2 * jnp.pi, jnp.where(yaw < -jnp.pi, yaw + 2 * jnp.pi, yaw))


def convert_to_closest_yaw(current_yaw: Array, goal_yaw: Array) -> Array:
    """Pick goal_yaw + {0, ±2π} closest to current_yaw (Geometry.h:77-104)."""
    cands = jnp.stack([goal_yaw, goal_yaw + 2 * jnp.pi, goal_yaw - 2 * jnp.pi], axis=-1)
    offs = jnp.abs(cands - current_yaw[..., None])
    idx = jnp.argmin(offs, axis=-1)
    return jnp.take_along_axis(cands, idx[..., None], axis=-1)[..., 0]


def rotate_control_to_body(u: Array, yaw: Array) -> Array:
    """Rotate [ax, ay, *] world->body about z (Geometry.h:41-52)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    ux = c * u[..., 0] + s * u[..., 1]
    uy = -s * u[..., 0] + c * u[..., 1]
    return jnp.concatenate([jnp.stack([ux, uy], axis=-1), u[..., 2:]], axis=-1)


def rotate_control_to_world(u: Array, yaw: Array) -> Array:
    """Inverse of rotate_control_to_body (Geometry.h:55-66)."""
    return rotate_control_to_body(u, -yaw)
