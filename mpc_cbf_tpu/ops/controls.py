"""Nominal controllers and noise injection.

Reference parity: ``math/include/math/Controls.h`` +
``math/src/Controls.cpp`` (PID, criticallyDampedSpringControl) and
``math/src/Random.cpp`` (addRandomNoise). Stateless functional forms: the
PID integral term is threaded explicitly so it scans/vmaps.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mpc_cbf_tpu.types import State, Array


def critically_damped_spring_control(state: State, target: Array, spring_constant: float) -> Array:
    """u = k (target - p) - 2 sqrt(k) v (Controls.h:17-27)."""
    return spring_constant * (target - state.pos) - 2.0 * jnp.sqrt(spring_constant) * state.vel


@dataclasses.dataclass(frozen=True)
class PIDParams:
    kp: float
    ki: float
    kd: float
    dt: float


def pid_control(params: PIDParams, state: State, integral_err: Array,
                ref_pos: Array, ref_vel: Array, ref_acc: Array):
    """One PID step; returns (u, new_integral_err) (Controls.cpp:13-23)."""
    pos_err = ref_pos - state.pos
    vel_err = ref_vel - state.vel
    integral_err = integral_err + pos_err * params.dt
    u = ref_acc + params.kp * pos_err + params.ki * integral_err + params.kd * vel_err
    return u, integral_err


def add_random_noise(key: jax.Array, state: State, pos_std: float, vel_std: float) -> State:
    """Gaussian state noise (math::addRandomNoise, Random.cpp)."""
    kp, kv = jax.random.split(key)
    return State(
        pos=state.pos + pos_std * jax.random.normal(kp, state.pos.shape, state.pos.dtype),
        vel=state.vel + vel_std * jax.random.normal(kv, state.vel.shape, state.vel.dtype),
    )
