"""Control Barrier Function engine via JAX autodiff.

Replaces the reference's GiNaC symbolic pipeline
(``workspace/lib/cbf/src/detail/FovCBF.cpp``,
``workspace/lib/cbf/src/detail/ConnectivityCBF.cpp``): barriers are plain
traced functions ``h(x, params)``; Lie derivatives come from ``jax.grad``
composition; the reference's per-call ``subs``/``evalf`` interpreter
disappears into one jitted program that vmaps over agents/neighbors.

Conventions (matching the reference):
- state x = [px, py, th, vx, vy, w]  (6,)
- control u = [ax, ay, alpha]        (3,)
- continuous dynamics xdot = f(x) + g u with f = [vx, vy, w, 0, 0, 0],
  g = [[0],[I3]]  (FovCBF.cpp:66-88)
- every constraint family yields a row (a, b) meaning  a . u + b >= 0;
  QP assemblies negate it into ``-a . u <= b``
  (FovQPGenerator.cpp:13-37: coefficients = -Ac, ub = Bc).

Relative-degree-2 rows (safety / FOV borders / range / connectivity,
FovCBF.cpp:159-241):
    a = grad(L_f h) . g
    b = L_f^2 h + L_f(alpha(h)) + alpha(L_f h + alpha(h))
Relative-degree-1 rows (velocity boxes, FovCBF.cpp:543-574):
    a = grad(h) . g
    b = L_f h + h              (linear alpha, gamma=1)

Alpha functions (class-K), per family as fixed at reference construction:
- FoV rel-deg-2 family: fifth power, gamma=0.1   (FovCBF.cpp:27-29, 58, 88)
- Connectivity safety:  cubic, gamma=5           (ConnectivityCBF.cpp:19-21, 63, 92)
- Connectivity lambda2: linear, gamma=5          (ConnectivityCBF.cpp:initConnCBF)
- CLF: beta1=5, beta2=2, d_desired=2             (ConnectivityCBF.cpp:200-245)
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from mpc_cbf_tpu.types import Array, BIG

# Continuous-time dynamics ---------------------------------------------------


def f_drift(x: Array) -> Array:
    """f(x) = [vx, vy, w, 0, 0, 0]."""
    return jnp.concatenate([x[3:6], jnp.zeros(3, x.dtype)])


# g is constant: u enters the velocity block directly.
def _g_matmul(v: Array) -> Array:
    """v . g for a 6-gradient v -> 3-row: picks the velocity block."""
    return v[3:6]


# Alpha functions -------------------------------------------------------------


def alpha_linear(gamma: float) -> Callable[[Array], Array]:
    return lambda s: gamma * s


def alpha_cubic(gamma: float) -> Callable[[Array], Array]:
    return lambda s: gamma * s**3


def alpha_fifth(gamma: float) -> Callable[[Array], Array]:
    return lambda s: gamma * s**5


# Generic row builders --------------------------------------------------------


def rel_deg2_row(h_fn: Callable[[Array], Array], alpha: Callable[[Array], Array], x: Array
                 ) -> Tuple[Array, Array]:
    """(a, b) for a relative-degree-2 barrier at state x.

    Mirrors FovCBF::initSafetyCBF's structure (FovCBF.cpp:159-241) with
    jax.grad in place of GiNaC::diff.
    """
    h = h_fn(x)

    def lfh_fn(xx):
        return jnp.dot(jax.grad(h_fn)(xx), f_drift(xx))

    lfh = lfh_fn(x)
    grad_lfh = jax.grad(lfh_fn)(x)
    lf2h = jnp.dot(grad_lfh, f_drift(x))
    a = _g_matmul(grad_lfh)

    def alpha_h_fn(xx):
        return alpha(h_fn(xx))

    lf_alpha = jnp.dot(jax.grad(alpha_h_fn)(x), f_drift(x))
    b = lf2h + lf_alpha + alpha(lfh + alpha(h))
    return a, b


def rel_deg1_row(h_fn: Callable[[Array], Array], alpha: Callable[[Array], Array], x: Array
                 ) -> Tuple[Array, Array]:
    """(a, b) for a relative-degree-1 barrier (FovCBF.cpp:543-574)."""
    grad_h = jax.grad(h_fn)(x)
    lfh = jnp.dot(grad_h, f_drift(x))
    a = _g_matmul(grad_h)
    b = lfh + alpha(h_fn(x))
    return a, b


# ---------------------------------------------------------------------------
# FoV CBF family (FovCBF.cpp)
# ---------------------------------------------------------------------------


def _rel_target(x: Array, target_xy: Array) -> Tuple[Array, Array]:
    """Target position in the robot body frame (FovCBF.cpp:161-168)."""
    dx = target_xy[0] - x[0]
    dy = target_xy[1] - x[1]
    c, s = jnp.cos(x[2]), jnp.sin(x[2])
    return c * dx + s * dy, -s * dx + c * dy


class FovCBF:
    """Field-of-view CBF family vs a 2D target.

    Ten constraint families, built eagerly by the reference ctor
    (FovCBF.cpp:40-148); here each is a method returning (a, b) with
    a . u + b >= 0. All methods take a single (6,) state and (2,) target and
    are meant to be vmapped by callers.

    Parameters mirror FovCBF::FovCBF(fov, safety_dist, max_dist, vmin, vmax).
    """

    def __init__(self, fov: float, safety_dist: float, max_dist: float,
                 vmin, vmax, gamma: float = 0.1):
        self.fov = float(fov)
        self.Ds = float(safety_dist)
        self.Rs = float(max_dist)
        self.vmin = jnp.asarray(vmin)
        self.vmax = jnp.asarray(vmax)
        self.alpha = alpha_fifth(gamma)

    # barrier functions -----------------------------------------------------
    def _h_safety(self, target_xy):
        def h(x):
            xr, yr = _rel_target(x, target_xy)
            return xr * xr + yr * yr - self.Ds**2
        return h

    def _h_range(self, target_xy):
        def h(x):
            xr, yr = _rel_target(x, target_xy)
            return self.Rs**2 - (xr * xr + yr * yr)
        return h

    def _h_border(self, target_xy, side: int):
        """side=+1 left border, side=-1 right border (FovCBF.cpp:247-449).

        fov < pi : tan(fov/2)*xr + side*yr
        fov == pi: xr
        pi < fov < 2pi: tan((2pi-fov)/2)*xr - side*yr
        fov >= 2pi: disabled (handled by caller).
        """
        fov = self.fov

        def h(x):
            xr, yr = _rel_target(x, target_xy)
            if fov < jnp.pi:
                return jnp.tan(fov / 2) * xr + side * yr
            elif abs(fov - jnp.pi) < 1e-12:
                return xr
            else:
                return jnp.tan((2 * jnp.pi - fov) / 2) * xr - side * yr
        return h

    def _border_disabled(self) -> bool:
        return self.fov >= 2 * jnp.pi - 1e-9

    # rows ------------------------------------------------------------------
    def safety_row(self, x: Array, target_xy: Array):
        """(FovCBF.cpp:159-241; oracle getSafetyConstraints/Bound:622-768)."""
        return rel_deg2_row(self._h_safety(target_xy), self.alpha, x)

    def range_row(self, x: Array, target_xy: Array):
        """(FovCBF.cpp:455-535)."""
        return rel_deg2_row(self._h_range(target_xy), self.alpha, x)

    def lb_row(self, x: Array, target_xy: Array):
        """Left FOV border (FovCBF.cpp:247-345)."""
        if self._border_disabled():
            return jnp.zeros(3, x.dtype), jnp.asarray(BIG, x.dtype)
        return rel_deg2_row(self._h_border(target_xy, +1), self.alpha, x)

    def rb_row(self, x: Array, target_xy: Array):
        """Right FOV border (FovCBF.cpp:351-449)."""
        if self._border_disabled():
            return jnp.zeros(3, x.dtype), jnp.asarray(BIG, x.dtype)
        return rel_deg2_row(self._h_border(target_xy, -1), self.alpha, x)

    def vel_rows(self, x: Array):
        """All 6 velocity barriers: (A [6,3], b [6]); first 3 are max
        (vmax - v), then 3 min (v - vmin) (FovCBF.cpp:112-147).

        L_f h = 0 for these barriers, so a = -+e_d and b = alpha(h) = h.
        """
        h_max = self.vmax - x[3:6]
        h_min = x[3:6] - self.vmin
        A = jnp.concatenate([-jnp.eye(3, dtype=x.dtype), jnp.eye(3, dtype=x.dtype)])
        b = jnp.concatenate([h_max, h_min])
        return A, b


# ---------------------------------------------------------------------------
# Connectivity CBF family (ConnectivityCBF.cpp)
# ---------------------------------------------------------------------------


class ConnectivityCBF:
    """Pairwise safety + lambda2-connectivity + CLF + velocity barriers.

    Mirrors ConnectivityCBF(min_dist, max_dist, vmin, vmax)
    (ConnectivityCBF.cpp:42-148). gamma=5, epsilon=0.1.
    """

    def __init__(self, min_dist: float, max_dist: float, vmin, vmax,
                 gamma: float = 5.0, epsilon: float = 0.1,
                 d_desired: float = 2.0, beta1: float = 5.0, beta2: float = 2.0):
        self.dmin = float(min_dist)
        self.dmax = float(max_dist)
        self.vmin = jnp.asarray(vmin)
        self.vmax = jnp.asarray(vmax)
        self.gamma = gamma
        self.epsilon = epsilon
        self.d_desired = d_desired
        self.beta1, self.beta2 = beta1, beta2
        self.alpha_safety = alpha_cubic(gamma)
        self.alpha_conn = alpha_linear(gamma)

    @property
    def sigma(self) -> float:
        """dmax^4 / ln 2 (ConnectivityCBF.cpp:381-383)."""
        import math
        return self.dmax**4 / math.log(2.0)

    # pairwise safety -------------------------------------------------------
    def safety_row(self, x: Array, neighbor_state: Array):
        """h = ||p - p_n||^2 - dmin^2 vs a (>=4,) neighbor state
        [px_n, py_n, ..., vx_n, vy_n] laid out like the ego state.

        The reference hand-derives the Lie terms with the *neighbor velocity
        in the drift* (ConnectivityCBF.cpp:152-198): L_f h = 2 dp . dv,
        L_f^2 h = 2 dv . dv, Ac = [2 dx, 2 dy, 0].
        """
        dx = x[0] - neighbor_state[0]
        dy = x[1] - neighbor_state[1]
        dvx = x[3] - neighbor_state[3]
        dvy = x[4] - neighbor_state[4]
        h = dx * dx + dy * dy - self.dmin**2
        lfh = 2.0 * (dx * dvx + dy * dvy)
        lf2h = 2.0 * (dvx * dvx + dvy * dvy)
        alpha = self.alpha_safety
        # L_f(alpha(h)): grad(alpha(h)) . f — alpha(h) depends on ego px,py
        # only; the reference differentiates wrt ego state so the neighbor
        # velocity does NOT appear here (ConnectivityCBF.cpp:170-186).
        dalpha_dh = 3.0 * self.gamma * h * h
        lf_alpha = dalpha_dh * (2.0 * dx * x[3] + 2.0 * dy * x[4])
        b = lf2h + lf_alpha + alpha(lfh + alpha(h))
        a = jnp.stack([2.0 * dx, 2.0 * dy, jnp.zeros((), x.dtype)])
        return a, b

    # CLF -------------------------------------------------------------------
    def clf_row(self, x: Array, neighbor_state: Array):
        """V = (||dp|| - d_desired)^2; row (a, b) with Bc = L_f^2 V +
        beta1 L_f V + beta2 V (ConnectivityCBF.cpp:200-245).

        Note: the generator uses this as  a . u <= -b  ("<= -getCLFBound",
        ConnectivityQPGenerator.cpp:44-59), callers handle the sign.
        """
        d_des = self.d_desired

        def V_fn(xx):
            dx = xx[0] - neighbor_state[0]
            dy = xx[1] - neighbor_state[1]
            dist = jnp.sqrt(dx * dx + dy * dy)
            return (dist - d_des) ** 2

        def lfV_fn(xx):
            g = jax.grad(V_fn)(xx)
            return g[0] * xx[3] + g[1] * xx[4]

        V = V_fn(x)
        lfV = lfV_fn(x)
        grad_lfV = jax.grad(lfV_fn)(x)
        # reference Lf2V uses only the position partials times velocity
        lf2V = grad_lfV[0] * x[3] + grad_lfV[1] * x[4]
        a = jnp.stack([grad_lfV[3], grad_lfV[4], jnp.zeros((), x.dtype)])
        b = lf2V + self.beta1 * lfV + self.beta2 * V
        return a, b

    # lambda2 connectivity --------------------------------------------------
    def adjacency(self, positions: Array) -> Array:
        """Weighted adjacency A_ij = exp((Rs^2 - d_ij^2)^2 / sigma) - 1 for
        d_ij <= Rs else 0 (ConnectivityCBF.cpp:390-409). positions [N, 2]."""
        diff = positions[:, None, :] - positions[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        w = jnp.exp((self.dmax**2 - d2) ** 2 / self.sigma) - 1.0
        n = positions.shape[0]
        mask = (d2 <= self.dmax**2) & ~jnp.eye(n, dtype=bool)
        return jnp.where(mask, w, 0.0)

    def lambda2(self, positions: Array, node_mask: Array = None) -> Tuple[Array, Array]:
        """Second-smallest Laplacian eigenvalue and its unit eigenvector
        (ConnectivityCBF.cpp:390-424). positions [N, 2].

        node_mask [N] (optional): absent nodes are DEFLATED out — their
        adjacency rows/cols are zeroed and a large diagonal shift pushes
        their (otherwise zero) eigenvalues above the real spectrum, so
        vals[1] is the λ₂ of the present-node subgraph with fixed shapes.
        The shift (1e3) dominates the true spectrum: edge weights are
        bounded by exp(Rs⁴/σ) − 1 = 1, so λ_max ≤ 2N for any sane N. The
        reference has no masking (fixed team size)."""
        A = self.adjacency(positions)
        if node_mask is not None:
            pair = node_mask[:, None] & node_mask[None, :]
            A = jnp.where(pair, A, 0.0)
        L = jnp.diag(jnp.sum(A, axis=1)) - A
        if node_mask is not None:
            L = L + 1e3 * jnp.diag((~node_mask).astype(L.dtype))
        vals, vecs = jnp.linalg.eigh(L)
        v = vecs[:, 1]
        v = v / jnp.linalg.norm(v)
        return vals[1], v

    def _grad_h_agent(self, positions: Array, eigvec: Array, i) -> Array:
        """d lambda2 / d p_i via the eigenvector formula (12):
        sum_j dA_ij/dp_i * (v_i - v_j)^2, with NO range cutoff — matching
        compute_full_grad_h (ConnectivityCBF.cpp:426-469) which omits the
        cutoff present in the numeric adjacency.
        Returns (2,)."""
        diff = positions[i][None, :] - positions  # [N, 2]
        d2 = jnp.sum(diff * diff, axis=-1)
        rs2 = self.dmax**2
        expo = jnp.exp((rs2 - d2) ** 2 / self.sigma)  # = A_ij + 1
        coef = -4.0 * expo * (rs2 - d2) / self.sigma  # dA_ij/d d^2 * 2... see below
        # dA_ij/dx_i = -4 (A_ij + 1) (Rs^2 - d^2)/sigma * dx
        vdiff2 = (eigvec[i] - eigvec) ** 2
        n = positions.shape[0]
        self_mask = jnp.arange(n) != i
        contrib = (coef * vdiff2)[:, None] * diff  # [N, 2]
        return jnp.sum(jnp.where(self_mask[:, None], contrib, 0.0), axis=0)

    def conn_row(self, x: Array, robot_states: Array, eigvec: Array, h_val: Array,
                 self_idx) -> Tuple[Array, Array]:
        """(a, b) for h = lambda2 - epsilon at robot self_idx.

        robot_states [N, 6]; eigvec [N] (held constant in differentiation,
        as in the reference where eigenvec_i are plain symbols);
        h_val is the numeric lambda2 - epsilon substituted at call time
        (ConnectivityCBF.cpp:471-552).

        b = L_f^2 h + gamma*L_f h + gamma*(L_f h + gamma*h_val)
        with L_f h = grad_i . v_i and L_f^2 h = v_i' Hess_i v_i where the
        Hessian is taken wrt this robot's own position only.
        """
        positions = robot_states[:, :2]

        def grad_fn(p_i):
            pos = positions.at[self_idx].set(p_i)
            return self._grad_h_agent(pos, eigvec, self_idx)

        p_self = positions[self_idx]
        grad_i = grad_fn(p_self)  # (2,)
        hess_i = jax.jacobian(grad_fn)(p_self)  # (2, 2)
        v_self = x[3:5]
        lfh = jnp.dot(grad_i, v_self)
        lf2h = v_self @ hess_i @ v_self
        g5 = self.alpha_conn
        b = lf2h + g5(lfh) + g5(lfh + g5(h_val))
        a = jnp.concatenate([grad_i, jnp.zeros(1, x.dtype)])
        return a, b

    def vel_rows(self, x: Array):
        """Same construction as FovCBF.vel_rows (ConnectivityCBF.cpp:105-141)."""
        h_max = self.vmax - x[3:6]
        h_min = x[3:6] - self.vmin
        A = jnp.concatenate([-jnp.eye(3, dtype=x.dtype), jnp.eye(3, dtype=x.dtype)])
        b = jnp.concatenate([h_max, h_min])
        return A, b
