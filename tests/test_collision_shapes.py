"""Collision shapes + box geometry helpers vs reference semantics.

Oracles mirror AlignedBoxCollisionShapeTest.cpp / CollisionShapeTest.cpp and
the math::Helpers contracts (Helpers.cpp:39-170).
"""
import numpy as np
import jax.numpy as jnp

from mpc_cbf_tpu.ops.collision_shapes import (
    AlignedBoxCollisionShape,
    bounding_hyperplanes,
    buffer_aligned_box,
    corner_points,
    linear_interpolate,
    snap_hyperplane,
)
from mpc_cbf_tpu.ops.geometry import voronoi_hyperplane, shift_hyperplane_for_box


def test_corner_points_2d():
    pts = np.asarray(corner_points(jnp.array([-1.0, -2.0]), jnp.array([3.0, 4.0])))
    expect = {(-1, -2), (3, -2), (-1, 4), (3, 4)}
    assert {tuple(p) for p in pts} == expect


def test_corner_points_3d_count():
    pts = corner_points(jnp.zeros(3), jnp.ones(3))
    assert pts.shape == (8, 3)
    assert float(jnp.sum(pts)) == 12.0  # each coordinate is 1 in half the corners


def test_aligned_box_shape_roundtrip():
    shape = AlignedBoxCollisionShape.from_half_extents([0.5, 0.5, 0.0])
    mn, mx = shape.bounding_box(jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(mn), [0.5, 1.5, 3.0])
    np.testing.assert_allclose(np.asarray(mx), [1.5, 2.5, 3.0])
    hull = np.asarray(shape.convex_hull_points(jnp.array([1.0, 2.0, 3.0])))
    assert hull.shape == (8, 3)
    assert hull.min(0).tolist() == [0.5, 1.5, 3.0]
    assert hull.max(0).tolist() == [1.5, 2.5, 3.0]


def test_inflate():
    shape = AlignedBoxCollisionShape.from_half_extents([0.5, 0.5])
    big = shape.inflate(0.25)
    np.testing.assert_allclose(big.half_extents, [0.75, 0.75])
    np.testing.assert_allclose(big.zero_min, [-0.75, -0.75])


def test_snap_hyperplane_touches_closest_point():
    # hyperplane x <= 2 (normal [1,0], offset -2); signed distances of the
    # points are -1 and -2, so the plane snaps by the minimum (-2) until it
    # touches the most-interior point: offset' = -2 - (-2) = 0
    normal = jnp.array([1.0, 0.0])
    offset = jnp.asarray(-2.0)
    points = jnp.array([[1.0, 0.0], [0.0, 5.0]])
    new_off = snap_hyperplane(normal, offset, points)
    np.testing.assert_allclose(float(new_off), 0.0)
    # the closest point now lies exactly on the plane
    sd = points @ normal + new_off
    np.testing.assert_allclose(float(jnp.min(sd)), 0.0, atol=1e-12)


def test_bounding_hyperplanes_contains_interior():
    normals, offsets = bounding_hyperplanes(jnp.array([-1.0, 0.0]), jnp.array([2.0, 3.0]))
    assert normals.shape == (4, 2)
    inside = jnp.array([0.5, 1.0])
    outside = jnp.array([2.5, 1.0])
    assert bool(jnp.all(normals @ inside + offsets <= 0))
    assert bool(jnp.any(normals @ outside + offsets > 0))


def test_buffer_aligned_box():
    mn, mx = buffer_aligned_box(
        jnp.array([-5.0, -5.0]), jnp.array([5.0, 5.0]),
        jnp.array([-0.5, -0.5]), jnp.array([0.5, 0.5]),
    )
    np.testing.assert_allclose(np.asarray(mn), [-4.5, -4.5])
    np.testing.assert_allclose(np.asarray(mx), [4.5, 4.5])


def test_linear_interpolate():
    p = linear_interpolate(jnp.asarray(0.0), jnp.array([0.0, 0.0]),
                           jnp.asarray(2.0), jnp.array([4.0, 8.0]), jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(p), [1.0, 2.0])


def test_shift_matches_corner_max():
    """shiftHyperplane's corner-point construction equals the support-function
    shortcut used in geometry.shift_hyperplane_for_box."""
    rng = np.random.default_rng(1)
    half = jnp.asarray(np.abs(rng.normal(0.6, 0.2, 3)))
    normal, offset = voronoi_hyperplane(jnp.asarray(rng.normal(size=3)),
                                        jnp.asarray(rng.normal(size=3)))
    shifted = shift_hyperplane_for_box(normal, offset, half)
    corners = corner_points(-half, half)
    # max over corners of normal . c equals the box support
    support = float(jnp.max(corners @ normal))
    np.testing.assert_allclose(float(shifted), float(offset) + support, rtol=1e-12)
