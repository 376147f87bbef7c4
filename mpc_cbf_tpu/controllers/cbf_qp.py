"""Single-step CBF-QP controllers (the reference's L5 "CBF-only" family).

Reference parity:
- FovControl:           ``cbf/src/controller/FovControl.cpp:17-90``
- ConnectivityControl:  ``cbf/src/controller/ConnectivityControl.cpp:22-99``
- QP assembly:          ``cbf/src/optimization/{CBFQPGeneratorBase,
  FovQPGenerator,ConnectivityQPGenerator}.cpp``

QP layout (n = DIM + S variables, DIM=3 control + S slack):
    minimize ||u - u_des||^2 + sum_i w_i s_i
    s.t.     -a_c . u - s_{c} <= b_c     per CBF constraint row c
             s >= 0, control bounds (Fov only; ConnectivityControl.cpp:62
             has them commented out)

Everything is fixed-shape: a controller is built for a maximum neighbor
count; per-step neighbor masks deactivate rows. The whole control step is
one jitted function, vmappable over an agent axis and a scenario axis —
the reference's sequential per-robot loop disappears.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mpc_cbf_tpu.types import Array, QPBatch, BIG
from mpc_cbf_tpu.ops.cbf import FovCBF, ConnectivityCBF
from mpc_cbf_tpu.ops.geometry import distance_to_ellipse
from mpc_cbf_tpu.ops.qp import solve_batch, ADMMConfig


def _rank_weights(distances: Array, mask: Array, w_init: float, decay: float) -> Array:
    """Slack weights by closeness rank: nearest neighbor gets w_init, k-th
    nearest w_init * decay^k (FovControl.cpp:31-49). Masked neighbors sort
    last and get (unused) tail weights."""
    d = jnp.where(mask, distances, jnp.inf)
    order = jnp.argsort(d)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return w_init * decay**ranks


def _slack_padded(a_rows: Array, n_slack: int, slack_idx: Array) -> Array:
    """Append slack columns: -1 at slack_idx per row, zeros elsewhere."""
    m = a_rows.shape[0]
    cols = jax.nn.one_hot(slack_idx, n_slack, dtype=a_rows.dtype)
    return jnp.concatenate([a_rows, -cols], axis=-1)


class CBFControlResult(NamedTuple):
    u: Array
    slack: Array
    converged: Array
    pri_res: Array


class FovCBFController:
    """Batched FovControl: QP over u in R^3 (+slacks) with 4 CBF rows per
    neighbor + velocity rows + control bounds."""

    def __init__(self, cbf: FovCBF, max_neighbors: int, slack_mode: bool = False,
                 slack_cost: float = 50000.0, slack_decay_rate: float = 0.1,
                 u_min=None, u_max=None,
                 solver: ADMMConfig = ADMMConfig(iters=200)):
        self.cbf = cbf
        self.N = max_neighbors
        self.slack_mode = slack_mode
        self.S = max_neighbors if slack_mode else 0
        self.slack_cost = slack_cost
        self.slack_decay = slack_decay_rate
        self.u_min = jnp.asarray(u_min) if u_min is not None else None
        self.u_max = jnp.asarray(u_max) if u_max is not None else None
        self.solver = solver

    @property
    def n(self) -> int:
        return 3 + self.S

    def assemble(self, state: Array, desired_u: Array, neighbor_xy: Array,
                 neighbor_cov: Array, neighbor_mask: Array) -> QPBatch:
        """Build the QP for one agent. state [6]; neighbor_xy [N, 2];
        neighbor_cov [N, 2, 2]; neighbor_mask [N] bool."""
        N, S, n = self.N, self.S, self.n
        dt = state.dtype

        # cost: ||u - u_des||^2 (+ linear slack cost)
        P = jnp.zeros((n, n), dt).at[:3, :3].set(2.0 * jnp.eye(3, dtype=dt))
        q = jnp.zeros(n, dt).at[:3].set(-2.0 * desired_u)
        if self.slack_mode:
            dists = jax.vmap(lambda m, c: distance_to_ellipse(state[:2], m, c))(
                neighbor_xy, neighbor_cov)
            w = _rank_weights(dists, neighbor_mask, self.slack_cost, self.slack_decay)
            q = q.at[3:].set(w)

        # CBF rows: per neighbor [safety, lb, rb, range]
        def rows_for_neighbor(t_xy):
            a_s, b_s = self.cbf.safety_row(state, t_xy)
            a_l, b_l = self.cbf.lb_row(state, t_xy)
            a_r, b_r = self.cbf.rb_row(state, t_xy)
            a_g, b_g = self.cbf.range_row(state, t_xy)
            return jnp.stack([a_s, a_l, a_r, a_g]), jnp.stack([b_s, b_l, b_r, b_g])

        A_nbr, b_nbr = jax.vmap(rows_for_neighbor)(neighbor_xy)  # [N,4,3],[N,4]
        A_cbf = (-A_nbr).reshape(4 * N, 3)  # generator negates (FovQPGenerator.cpp:17)
        # cap alpha-composition bounds for f32 (see mpc_cbf.CBF_BOUND_CAP)
        from mpc_cbf_tpu.controllers.mpc_cbf import CBF_BOUND_CAP
        ub_cbf = jnp.clip(b_nbr.reshape(4 * N), -CBF_BOUND_CAP, CBF_BOUND_CAP)
        row_mask = jnp.repeat(neighbor_mask, 4)
        # prune provably-inactive rows: |a . u| <= ||a||_1 * u_reach given
        # the control-bound rows below (far-neighbor alpha compositions
        # produce b ~ 1e4+, which wrecks f32 ADMM row scaling)
        if self.u_max is not None or self.u_min is not None:
            hi = jnp.max(jnp.abs(self.u_max)) if self.u_max is not None else jnp.inf
            lo = jnp.max(jnp.abs(self.u_min)) if self.u_min is not None else jnp.inf
            u_reach = jnp.maximum(hi, lo)
            a_l1 = jnp.sum(jnp.abs(A_cbf[:, :3]), axis=-1)
            row_mask = row_mask & (ub_cbf <= a_l1 * u_reach)
        A_cbf = jnp.where(row_mask[:, None], A_cbf, 0.0)
        ub_cbf = jnp.where(row_mask, ub_cbf, BIG)
        if self.slack_mode:
            slack_idx = jnp.repeat(jnp.arange(N), 4)
            A_cbf = _slack_padded(A_cbf, S, slack_idx)
            A_cbf = jnp.where(row_mask[:, None], A_cbf, 0.0)
        else:
            A_cbf = jnp.concatenate([A_cbf, jnp.zeros((4 * N, S), dt)], axis=-1)

        # velocity rows (relative degree 1): -a . u <= b
        A_vel_u, b_vel = self.cbf.vel_rows(state)
        A_vel = jnp.concatenate([-A_vel_u, jnp.zeros((6, S), dt)], axis=-1)

        blocks_A = [A_cbf, A_vel]
        blocks_lb = [jnp.full(4 * N, -BIG, dt), jnp.full(6, -BIG, dt)]
        blocks_ub = [ub_cbf, b_vel]

        # control bounds + slack nonnegativity as identity rows
        eye = jnp.eye(n, dtype=dt)
        lo = jnp.full(n, -BIG, dt)
        hi = jnp.full(n, BIG, dt)
        if self.u_min is not None:
            lo = lo.at[:3].set(self.u_min.astype(dt))
        if self.u_max is not None:
            hi = hi.at[:3].set(self.u_max.astype(dt))
        if S:
            lo = lo.at[3:].set(0.0)
        blocks_A.append(eye)
        blocks_lb.append(lo)
        blocks_ub.append(hi)

        return QPBatch(
            P=P, q=q,
            A=jnp.concatenate(blocks_A, axis=0),
            lb=jnp.concatenate(blocks_lb, axis=-1),
            ub=jnp.concatenate(blocks_ub, axis=-1),
        )

    def control(self, state: Array, desired_u: Array, neighbor_xy: Array,
                neighbor_cov: Array, neighbor_mask: Array,
                warm: Optional[Tuple[Array, Array]] = None) -> CBFControlResult:
        qp = self.assemble(state, desired_u, neighbor_xy, neighbor_cov, neighbor_mask)
        x0, y0 = warm if warm is not None else (None, None)
        sol = solve_batch(qp, self.solver, x0=x0, y0=y0)
        return CBFControlResult(
            u=sol.z[..., :3], slack=sol.z[..., 3:],
            converged=sol.converged, pri_res=sol.pri_res,
        )


class ConnectivityCBFController:
    """Batched ConnectivityControl: pairwise safety + (lambda2 CBF | CLF
    fallback) + velocity rows (ConnectivityControl.cpp:22-99).

    Built for a fixed robot count `num_robots`; the agent axis is the
    vmapped self_idx. The reference's data-dependent branch
    (lambda2 > 0.1 ? conn : CLF, :71-84) becomes row masking so all agents
    stay in one lockstep program.
    """

    LAMBDA2_THRESHOLD = 0.1  # ConnectivityControl.cpp:70-72

    def __init__(self, cbf: ConnectivityCBF, num_robots: int, slack_mode: bool = False,
                 slack_cost: float = 50000.0, slack_decay_rate: float = 0.1,
                 solver: ADMMConfig = ADMMConfig(iters=200)):
        self.cbf = cbf
        self.R = num_robots
        self.slack_mode = slack_mode
        self.S = num_robots if slack_mode else 0
        self.slack_cost = slack_cost
        self.slack_decay = slack_decay_rate
        self.solver = solver

    @property
    def n(self) -> int:
        return 3 + self.S

    def assemble(self, robot_states: Array, self_idx: Array, desired_u: Array,
                 lam2_eigvec=None) -> QPBatch:
        """robot_states [R, 6]; self_idx scalar int; desired_u [3].

        lam2_eigvec: optional precomputed (lambda2, eigvec) of the TEAM —
        it is a per-team quantity, so callers vmapping over self_idx
        should compute it ONCE and pass it in (control_all does); left
        inside for single-robot parity with ConnectivityControl.cpp:69.
        """
        R, S, n = self.R, self.S, self.n
        state = robot_states[self_idx]
        dt = robot_states.dtype

        P = jnp.zeros((n, n), dt).at[:3, :3].set(2.0 * jnp.eye(3, dtype=dt))
        q = jnp.zeros(n, dt).at[:3].set(-2.0 * desired_u)
        if self.slack_mode:
            # index-decayed weights (ConnectivityControl.cpp:33-40)
            w = self.slack_cost * self.slack_decay ** jnp.arange(S, dtype=dt)
            q = q.at[3:].set(w)

        # lambda2 of the whole team (hoisted by control_all)
        lam2, eigvec = (self.cbf.lambda2(robot_states[:, :2])
                        if lam2_eigvec is None else lam2_eigvec)
        h_val = lam2 - self.cbf.epsilon
        use_conn = lam2 > self.LAMBDA2_THRESHOLD

        is_self = jnp.arange(R) == self_idx

        # pairwise safety rows vs every other robot
        def safety(nbr_state):
            a, b = self.cbf.safety_row(state, nbr_state)
            return -a, b  # generator negation (ConnectivityQPGenerator.cpp:77-83)

        A_saf, b_saf = jax.vmap(safety)(robot_states)  # [R,3],[R]
        from mpc_cbf_tpu.controllers.mpc_cbf import CBF_BOUND_CAP
        b_saf = jnp.clip(b_saf, -CBF_BOUND_CAP, CBF_BOUND_CAP)
        A_saf = jnp.where(is_self[:, None], 0.0, A_saf)
        b_saf = jnp.where(is_self, BIG, b_saf)
        # prune provably-inactive far-neighbor rows: the velocity-barrier
        # rows imply |u_d| <= (vmax - vmin)_d (relative-degree-1, alpha=id),
        # so b beyond ||a||_1 * u_reach can never bind (f32 ADMM scaling)
        u_reach = jnp.max(jnp.abs(self.cbf.vmax - self.cbf.vmin))
        a_l1 = jnp.sum(jnp.abs(A_saf[:, :3]), axis=-1)
        b_saf = jnp.where(b_saf > a_l1 * u_reach, BIG, b_saf)
        # slack idx for neighbor j: its position among non-self robots
        nbr_ord = jnp.cumsum(~is_self) - 1
        if S:
            A_saf = _slack_padded(A_saf, S, nbr_ord)
            A_saf = jnp.where(is_self[:, None], 0.0, A_saf)
        else:
            A_saf = jnp.concatenate([A_saf, jnp.zeros((R, S), dt)], axis=-1)

        # connectivity row (active when lambda2 > threshold)
        a_c, b_c = self.cbf.conn_row(state, robot_states, eigvec, h_val, self_idx)
        A_conn = jnp.concatenate([-a_c, jnp.zeros(S, dt)])[None]
        if S:
            A_conn = A_conn.at[0, 3 + S - 1].set(-1.0)  # last slack (ConnectivityQPGenerator.cpp:36)
        ub_conn = jnp.where(use_conn, b_c, BIG)[None]
        A_conn = jnp.where(use_conn, A_conn, 0.0)

        # CLF rows per neighbor (active when lambda2 <= threshold);
        # NOTE sign: coefficients are +a, bound is -b
        # (ConnectivityQPGenerator.cpp:47-55)
        def clf(nbr_state):
            a, b = self.cbf.clf_row(state, nbr_state)
            return a, -b

        A_clf, ub_clf = jax.vmap(clf)(robot_states)
        clf_mask = (~is_self) & (~use_conn)
        A_clf = jnp.where(clf_mask[:, None], A_clf, 0.0)
        ub_clf = jnp.where(clf_mask, ub_clf, BIG)
        if S:
            A_clf = _slack_padded(A_clf, S, nbr_ord)
            A_clf = jnp.where(clf_mask[:, None], A_clf, 0.0)
        else:
            A_clf = jnp.concatenate([A_clf, jnp.zeros((R, S), dt)], axis=-1)

        # velocity rows
        A_vel_u, b_vel = self.cbf.vel_rows(state)
        A_vel = jnp.concatenate([-A_vel_u, jnp.zeros((6, S), dt)], axis=-1)

        blocks_A = [A_saf, A_conn, A_clf, A_vel]
        blocks_lb = [jnp.full(R, -BIG, dt), jnp.full(1, -BIG, dt),
                     jnp.full(R, -BIG, dt), jnp.full(6, -BIG, dt)]
        blocks_ub = [b_saf, ub_conn, ub_clf, b_vel]

        # slack nonnegativity (no control bounds: ConnectivityControl.cpp:62)
        if S:
            eye_s = jnp.concatenate([jnp.zeros((S, 3), dt), jnp.eye(S, dtype=dt)], axis=-1)
            blocks_A.append(eye_s)
            blocks_lb.append(jnp.zeros(S, dt))
            blocks_ub.append(jnp.full(S, BIG, dt))

        return QPBatch(
            P=P, q=q,
            A=jnp.concatenate(blocks_A, axis=0),
            lb=jnp.concatenate(blocks_lb, axis=-1),
            ub=jnp.concatenate(blocks_ub, axis=-1),
        )

    def control(self, robot_states: Array, self_idx: Array, desired_u: Array,
                warm: Optional[Tuple[Array, Array]] = None,
                lam2_eigvec=None) -> CBFControlResult:
        qp = self.assemble(robot_states, self_idx, desired_u, lam2_eigvec)
        x0, y0 = warm if warm is not None else (None, None)
        sol = solve_batch(qp, self.solver, x0=x0, y0=y0)
        return CBFControlResult(
            u=sol.z[..., :3], slack=sol.z[..., 3:],
            converged=sol.converged, pri_res=sol.pri_res,
        )

    def control_all(self, robot_states: Array, desired_us: Array) -> CBFControlResult:
        """All robots in one vmapped solve: desired_us [R, 3]. The team
        eigendecomposition runs ONCE here, not once per robot (the
        reference recomputes it per robot call, ConnectivityControl.cpp:69
        — a per-team quantity)."""
        le = self.cbf.lambda2(robot_states[:, :2])
        qp = jax.vmap(lambda i, ud: self.assemble(robot_states, i, ud, le))(
            jnp.arange(self.R), desired_us)
        sol = solve_batch(qp, self.solver)
        return CBFControlResult(
            u=sol.z[..., :3], slack=sol.z[..., 3:],
            converged=sol.converged, pri_res=sol.pri_res,
        )
