"""Batched multi-agent simulation loops.

Replaces the reference's sequential per-robot sim mains
(``mpc_cbf/examples/connectivity/MPCCBFFormationControl_example.cpp:135-224``):
the `for robot` / `for iter` nest becomes one vmapped+jitted control step,
the outer sim loop a ``lax.scan``, scenarios an extra vmapped (and
mesh-sharded) leading axis.

Semantics note (SURVEY.md §7.6): the reference updates robots *sequentially*
within a timestep — robot i replans after robots j<i already moved. Here all
agents replan from the same snapshot (synchronized update), which is the
parallel-correct choice; trajectory parity with the reference is therefore
at the metric level, and per-QP parity at identical inputs.

Failure semantics (reference MPCCBFFormationControl_example.cpp:150-164):
on a failed solve the robot keeps flying its last successful curve — here a
``jnp.where`` on the per-agent success flag.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpc_cbf_tpu.types import State, Array
from mpc_cbf_tpu.controllers.bezier_mpc import BezierMPCOperator
from mpc_cbf_tpu.controllers.mpc_cbf import _IMPCCBFBase, ConnectivityIMPCCBF, FovIMPCCBF
from mpc_cbf_tpu.ops.controls import add_random_noise
from mpc_cbf_tpu.parallel.mesh import SCENARIO_AXIS


class SimResult(NamedTuple):
    states: State            # final [.., A, dim] states
    traj_pos: Array          # [.., T, A, dim] positions at every replan step
    traj_vel: Array          # [.., T, A, dim]
    success: Array           # [.., T, A] per-step solver success
    coeffs: Array            # final curve coefficients [.., A, n_dec]


def _neighbor_blob_connectivity(states: State, i: Array, num_agents: int) -> Array:
    """All other agents' full states [A-1, 6] for agent i."""
    allx = jnp.concatenate([states.pos, states.vel], axis=-1)  # [A, 6]
    others = jnp.delete(jnp.arange(num_agents), i, assume_unique_indices=True)
    return allx[others]


def _neighbor_blob_fov(states: State, i: Array, num_agents: int, cov_diag: float) -> Array:
    """Other agents' [x, y, cov...] blobs with a fixed diagonal covariance
    (the simulation examples feed fixed estimates,
    BezierIMPCCBFPFXYYaw_example.cpp:196-203)."""
    others = jnp.delete(jnp.arange(num_agents), i, assume_unique_indices=True)
    xy = states.pos[others][:, :2]
    n = xy.shape[0]
    cov = jnp.broadcast_to(
        jnp.array([cov_diag, 0.0, cov_diag], xy.dtype), (n, 3)
    )
    return jnp.concatenate([xy, cov], axis=-1)


@dataclasses.dataclass(frozen=True)
class MultiAgentSim:
    """Closed-loop sim of one IMPC-CBF controller over A agents.

    controller: a FovIMPCCBF or ConnectivityIMPCCBF built for
    max_neighbors == num_agents - 1.
    """

    controller: _IMPCCBFBase
    num_agents: int
    noise_pos_std: float = 0.0
    noise_vel_std: float = 0.0
    fov_cov_diag: float = 0.01

    def control_step(self, states: State, goals: Array,
                     warm: Optional[Array] = None):
        """One replanning step for all agents from a common snapshot.

        states: [A, dim] State; goals: [A, dim]. Returns (coeffs [A, n],
        success [A]).
        """
        ctrl, op = self.controller, self.controller.op
        A = self.num_agents

        def one(i, warm_i):
            ref = jnp.tile(goals[i], op.mpc.k_hor)
            if isinstance(ctrl, FovIMPCCBF):
                blob = _neighbor_blob_fov(states, i, A, self.fov_cov_diag)
            else:
                blob = _neighbor_blob_connectivity(states, i, A)
            cur = State(pos=states.pos[i], vel=states.vel[i])
            res = ctrl.optimize(cur, ref, blob, jnp.ones(A - 1, bool), warm=warm_i)
            return res.coeffs, res.success

        warm_b = warm if warm is not None else jnp.zeros((A, ctrl.n), states.pos.dtype)
        return jax.vmap(one)(jnp.arange(A), warm_b)

    def fly(self, coeffs: Array, prev: State, success: Array, key: Array) -> State:
        """Advance each agent h seconds along its curve (the reference's
        Ts-grid evaluation collapses to the endpoint sample + noise;
        failed agents hold position with zero velocity,
        MPCCBFFormationControl_example.cpp:208-221)."""
        op = self.controller.op
        t_end = float(op.ts_samples[-1] + op.mpc.Ts)
        pos = jax.vmap(lambda z: op.eval_solution(z, [t_end], 0)[0])(coeffs)
        vel = jax.vmap(lambda z: op.eval_solution(z, [t_end], 1)[0])(coeffs)
        pos = jnp.where(success[:, None], pos, prev.pos)
        vel = jnp.where(success[:, None], vel, jnp.zeros_like(vel))
        st = State(pos=pos, vel=vel)
        if self.noise_pos_std > 0 or self.noise_vel_std > 0:
            st = add_random_noise(key, st, self.noise_pos_std, self.noise_vel_std)
        return st

    @partial(jax.jit, static_argnames=("self", "num_steps"))
    def rollout(self, init: State, goals: Array, num_steps: int,
                key: Optional[Array] = None) -> SimResult:
        """scan the closed loop for num_steps replanning periods."""
        if key is None:
            key = jax.random.PRNGKey(0)
        n = self.controller.n

        def step(carry, k):
            states, warm = carry
            coeffs, success = self.control_step(states, goals, warm)
            new_states = self.fly(coeffs, states, success, k)
            warm_new = jnp.zeros_like(warm).at[:, : coeffs.shape[-1]].set(coeffs)
            return (new_states, warm_new), (new_states.pos, new_states.vel, success, coeffs)

        keys = jax.random.split(key, num_steps)
        warm0 = jnp.zeros((self.num_agents, n), init.pos.dtype)
        (final, _), (tp, tv, succ, coeffs) = jax.lax.scan(step, (init, warm0), keys)
        return SimResult(states=final, traj_pos=tp, traj_vel=tv,
                         success=succ, coeffs=coeffs[-1])


def sharded_rollout(sim: MultiAgentSim, mesh: Mesh, init: State, goals: Array,
                    num_steps: int, keys: Optional[Array] = None) -> SimResult:
    """Scenario-sharded rollout: leading axis S of init/goals is sharded
    over the mesh's scenario axis; each scenario is an independent closed
    loop (near-linear scaling — the TPU replacement for ScaleScript.sh).

    init: State with [S, A, dim] leaves; goals [S, A, dim].
    """
    S = goals.shape[0]
    if keys is None:
        keys = jax.random.split(jax.random.PRNGKey(0), S)
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    init = jax.tree.map(lambda x: jax.device_put(x, sharding), init)
    goals = jax.device_put(goals, sharding)
    keys = jax.device_put(keys, sharding)

    @jax.jit
    def run(init, goals, keys):
        return jax.vmap(lambda i, g, k: sim.rollout(i, g, num_steps, k))(init, goals, keys)

    return run(init, goals, keys)
