"""State-space model zoo: dynamics + measurement models and simulators.

TPU-first re-design of ``ssmtoybox/ssmod.py``.  Every model is an immutable
flax pytree whose ``dyn_fcn(x, q, time)`` / ``meas_fcn(x, r, time)`` are pure
jnp functions of a *single* state vector; batching over Monte-Carlo
trajectories is done by the caller with ``jax.vmap`` and time recursion with
``jax.lax.scan`` — replacing the doubly-nested Python loops of the reference
simulators (``ssmod.py:196-198``, ``ssmod.py:1035-1038``).

Noise-additivity dispatch (``dyn_eval``/``meas_eval``) follows
``ssmod.py:129-166`` and ``ssmod.py:960-1009``; it is resolved at trace time
because additivity is a static class attribute.

Jacobians: the reference hand-codes ``dyn_fcn_dx``/``meas_fcn_dx`` for some
models (``ssmod.py:271-272`` etc.).  Here filters obtain exact Jacobians with
``jax.jacfwd`` of ``dyn_eval``/``meas_eval`` — including the scatter of the
measurement Jacobian into full state dimensions, which falls out of tracing
through the ``state_index`` gather (cf. ``ssmod.py:993-1006``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .utils.rv import GaussRV, StudentRV

__all__ = [
    "TransitionModel", "MeasurementModel",
    "UNGMTransition", "UNGMNATransition", "Pendulum2DTransition",
    "ReentryVehicle1DTransition", "ReentryVehicle2DTransition",
    "CoordinatedTurnTransition", "ConstantTurnRateSpeed", "ConstantVelocity",
    "UNGMMeasurement", "UNGMNAMeasurement", "Pendulum2DMeasurement",
    "RangeMeasurement", "BearingMeasurement", "Radar2DMeasurement",
]


# ---------------------------------------------------------------------------
# Transition models
# ---------------------------------------------------------------------------

class TransitionModel(struct.PyTreeNode):
    """Base transition model (cf. ``ssmod.py:10-244``).

    Subclasses set the static class attributes ``dim_state``, ``dim_noise``,
    ``noise_additive`` and implement ``dyn_fcn`` (and optionally
    ``dyn_fcn_cont`` for SDE models).
    """

    init_rv: GaussRV | StudentRV
    noise_rv: GaussRV | StudentRV
    noise_gain: jax.Array

    # static per-class geometry — deliberately NOT dataclass fields (no
    # annotations), so they stay plain class attributes overridable by
    # subclasses and never become pytree leaves
    dim_state = 0
    dim_noise = 0
    noise_additive = True

    @classmethod
    def create(cls, init_rv, noise_rv, noise_gain=None, **kwargs):
        if noise_gain is None:
            noise_gain = jnp.eye(cls.dim_state, cls.dim_noise, dtype=init_rv.mean.dtype)
        else:
            noise_gain = jnp.asarray(noise_gain, dtype=init_rv.mean.dtype)
        return cls(init_rv=init_rv, noise_rv=noise_rv, noise_gain=noise_gain, **kwargs)

    # -- static geometry ----------------------------------------------------
    @property
    def dim_in(self) -> int:
        """Input dim of the dynamics function (``ssmod.py:43-45``)."""
        return self.dim_state if self.noise_additive else self.dim_state + self.dim_noise

    # -- model equations ------------------------------------------------------
    def dyn_fcn(self, x, q, time):  # pragma: no cover - interface
        raise NotImplementedError

    def dyn_fcn_cont(self, x, q, time):  # pragma: no cover - interface
        raise NotImplementedError

    def dyn_fcn_dx(self, x, q, time):
        """Exact Jacobian via forward-mode AD (replaces hand-coded ``dyn_fcn_dx``).

        For non-additive models the reference's hand-coded Jacobians include
        the noise columns (e.g. ``ssmod.py:305-306``), so the AD Jacobian is
        taken w.r.t. the augmented ``[x, q]`` there — shape (dim_out,
        dim_state + dim_noise)."""
        if self.noise_additive:
            return jnp.atleast_2d(jax.jacfwd(lambda v: self.dyn_fcn(v, q, time))(x))
        d = self.dim_state
        xq = jnp.concatenate([jnp.atleast_1d(x), jnp.atleast_1d(q)])
        return jnp.atleast_2d(jax.jacfwd(
            lambda v: self.dyn_fcn(v[:d], v[d:], time))(xq))

    def dyn_eval(self, xq, time):
        """Additivity dispatch (``ssmod.py:129-166``), value branch only.

        Derivatives are obtained by AD of this function.
        """
        if self.noise_additive:
            zero_q = jnp.zeros((self.dim_noise,), dtype=xq.dtype)
            return self.dyn_fcn(xq, zero_q, time)
        x, q = xq[: self.dim_state], xq[-self.dim_noise:]
        return self.dyn_fcn(x, q, time)

    # -- simulators -----------------------------------------------------------
    def simulate_discrete(self, key, steps: int, mc_sims: int = 1) -> jax.Array:
        """Discrete-time trajectory simulation, ``scan`` over time x ``vmap``
        over MC runs (replaces the Python loops at ``ssmod.py:168-199``).

        Returns (dim_state, steps, mc_sims); ``x[:, 0]`` are the sampled
        initial conditions.
        """
        k0, kq = jax.random.split(key)
        x0 = self.init_rv.sample(k0, (mc_sims,))                  # (D, M)
        q = self.noise_rv.sample(kq, (steps, mc_sims))            # (Dq, steps, M)
        qs = jnp.moveaxis(q, 1, 0)[: steps - 1]                   # (steps-1, Dq, M)
        ks = jnp.arange(steps - 1)

        dyn = jax.vmap(self.dyn_fcn, in_axes=(1, 1, None), out_axes=1)

        def step(x, inp):
            q_k, k = inp
            xn = dyn(x, q_k, k)
            return xn, xn

        _, xs = jax.lax.scan(step, x0, (qs, ks))
        return jnp.moveaxis(jnp.concatenate([x0[None], xs], axis=0), 0, 1)

    def simulate_continuous(self, key, duration: float, dt: float = 0.1, mc_sims: int = 1) -> jax.Array:
        """Euler-Maruyama SDE simulation (``ssmod.py:201-244``).

        Noise is scaled by ``sqrt(dt)/dt`` so that ``V[q_k] = dt * Q`` after
        the ``dt`` multiply, matching the reference.  Returns
        (dim_state, steps, mc_sims) — the initial condition is dropped,
        exactly like ``ssmod.py:244``.
        """
        steps = int(np.floor(duration / dt))
        k0, kq = jax.random.split(key)
        x0 = self.init_rv.sample(k0, (mc_sims,))
        q = (jnp.sqrt(dt) / dt) * self.noise_rv.sample(kq, (steps + 1, mc_sims))
        qs = jnp.moveaxis(q, 1, 0)[:steps]                        # indices 0..steps-1
        ks = jnp.arange(steps)

        dyn_c = jax.vmap(self.dyn_fcn_cont, in_axes=(1, 1, None), out_axes=1)

        def step(x, inp):
            q_k, k = inp
            xn = x + dt * dyn_c(x, q_k, k)
            return xn, xn

        _, xs = jax.lax.scan(step, x0, (qs, ks))
        return jnp.moveaxis(xs, 0, 1)


class UNGMTransition(TransitionModel):
    """Univariate nonlinear growth model, additive noise (``ssmod.py:247-275``)."""

    dim_state = 1
    dim_noise = 1
    noise_additive = True

    def dyn_fcn(self, x, q, time):
        return 0.5 * x + 25.0 * (x / (1.0 + x ** 2)) + 8.0 * jnp.cos(1.2 * time) + q

    def dyn_fcn_cont(self, x, q, time):
        raise NotImplementedError


class UNGMNATransition(TransitionModel):
    """UNGM with non-additive noise (``ssmod.py:278-306``)."""

    dim_state = 1
    dim_noise = 1
    noise_additive = False

    def dyn_fcn(self, x, q, time):
        return 0.5 * x + 25.0 * (x / (1.0 + x ** 2)) + 8.0 * q * jnp.cos(1.2 * time)

    def dyn_fcn_cont(self, x, q, time):
        raise NotImplementedError


class Pendulum2DTransition(TransitionModel):
    """Pendulum in 2D, Sarkka ex. 5.1 (``ssmod.py:309-365``)."""

    dim_state = 2
    dim_noise = 2
    noise_additive = True

    dt: float = struct.field(pytree_node=False, default=0.01)
    g: float = struct.field(pytree_node=False, default=9.81)

    def dyn_fcn(self, x, q, time):
        return jnp.stack([x[0] + x[1] * self.dt,
                          x[1] - self.g * self.dt * jnp.sin(x[0])]) + q

    def dyn_fcn_cont(self, x, q, time):
        raise NotImplementedError


class ReentryVehicle1DTransition(TransitionModel):
    """1D reentry vehicle (Julier & Uhlmann 1996) (``ssmod.py:368-435``)."""

    dim_state = 3
    dim_noise = 3
    noise_additive = True

    dt: float = struct.field(pytree_node=False, default=0.1)
    Gamma: float = struct.field(pytree_node=False, default=1.0 / 6.096)

    def dyn_fcn(self, x, q, time):
        return jnp.stack([
            x[0] - self.dt * x[1] + q[0],
            x[1] - self.dt * jnp.exp(-self.Gamma * x[0]) * x[1] ** 2 * x[2] + q[1],
            x[2] + q[2],
        ])

    def dyn_fcn_cont(self, x, q, time):
        return jnp.stack([
            -x[1] + q[0],
            -jnp.exp(-self.Gamma * x[0]) * x[1] ** 2 * x[2] + q[1],
            q[2],
        ])


class ReentryVehicle2DTransition(TransitionModel):
    """2D reentry radar-tracking benchmark (Julier & Uhlmann 2004)
    (``ssmod.py:438-584``). Noise gain ``G = [0_{2x3}; I_3]``.
    """

    dim_state = 5
    dim_noise = 3
    noise_additive = True

    dt: float = struct.field(pytree_node=False, default=0.1)
    R0: float = struct.field(pytree_node=False, default=6374.0)
    H0: float = struct.field(pytree_node=False, default=13.406)
    Gm0: float = struct.field(pytree_node=False, default=3.9860e5)
    b0: float = struct.field(pytree_node=False, default=-0.59783)

    @classmethod
    def create(cls, init_rv, noise_rv, noise_gain=None, **kwargs):
        if noise_gain is None:
            noise_gain = np.vstack((np.zeros((2, cls.dim_noise)), np.eye(cls.dim_noise)))
        return super().create(init_rv, noise_rv, noise_gain, **kwargs)

    def _drag_gravity(self, x):
        R = jnp.sqrt(x[0] ** 2 + x[1] ** 2)
        V = jnp.sqrt(x[2] ** 2 + x[3] ** 2)
        # algebraically fused form of b0*exp(x4) * exp((R0-R)/H0) * V
        # (``ssmod.py:571-575`` computes the two exps separately): emulated
        # f64 `exp` costs ~25x a mul on TPU (tools/microbench_f64.py), so one
        # exp instead of two is the biggest single win in this model's math
        D = self.b0 * jnp.exp(x[4] + (self.R0 - R) / self.H0) * V
        G = -self.Gm0 / R ** 3
        return D, G

    def dyn_fcn(self, x, q, time):
        D, G = self._drag_gravity(x)
        return jnp.stack([
            x[0] + self.dt * x[2],
            x[1] + self.dt * x[3],
            x[2] + self.dt * (D * x[2] + G * x[0]) + q[0],
            x[3] + self.dt * (D * x[3] + G * x[1]) + q[1],
            x[4] + q[2],
        ])

    def dyn_fcn_cont(self, x, q, time):
        D, G = self._drag_gravity(x)
        return jnp.stack([
            x[2],
            x[3],
            D * x[2] + G * x[0] + q[0],
            D * x[3] + G * x[1] + q[1],
            q[2],
        ])


class CoordinatedTurnTransition(TransitionModel):
    """Coordinated-turn model with unknown turn rate (``ssmod.py:587-696``).

    The reference divides by the turn rate ``om`` without a guard
    (``ssmod.py:683-684``); here the ``om -> 0`` limit (``c -> dt``,
    ``d -> 0``) is substituted via ``jnp.where`` so the compiled program is
    NaN-free for any input while agreeing exactly for ``om != 0``.
    """

    dim_state = 5
    dim_noise = 5
    noise_additive = True

    dt: float = struct.field(pytree_node=False, default=0.1)

    def dyn_fcn(self, x, q, time):
        om = x[4]
        tiny = jnp.asarray(1e-30, dtype=x.dtype)
        om_safe = jnp.where(jnp.abs(om) < tiny, tiny, om)
        a = jnp.sin(om * self.dt)
        b = jnp.cos(om * self.dt)
        c = jnp.where(jnp.abs(om) < tiny, self.dt, a / om_safe)
        d = jnp.where(jnp.abs(om) < tiny, 0.0, (1.0 - b) / om_safe)
        return jnp.stack([
            x[0] + c * x[1] - d * x[3],
            b * x[1] - a * x[3],
            x[2] + d * x[1] + c * x[3],
            a * x[1] + b * x[3],
            x[4],
        ]) + q

    def dyn_fcn_cont(self, x, q, time):
        raise NotImplementedError


class ConstantTurnRateSpeed(TransitionModel):
    """Constant turn-rate and speed model, non-additive noise
    (``ssmod.py:699-780``).  The yaw-rate == 0 branch of the reference
    (``ssmod.py:756-774``) becomes a ``jnp.where`` select.
    """

    dim_state = 5
    dim_noise = 2
    noise_additive = False

    dt: float = struct.field(pytree_node=False, default=0.05)
    #: The reference's code increments the heading by ``dt * heading``
    #: (``ssmod.py:763,771``) — contradicting its own docstring AND its
    #: continuous dynamics (``dyn_fcn_cont``: heading' = yaw rate), so the
    #: heading grows geometrically regardless of the turn rate.  The default
    #: here is the DOCUMENTED model (``heading += dt * yaw_rate``); build
    #: with ``compat_heading=True`` for bit-parity with the reference
    #: (the golden parity tests do).  See docs/parity.md.
    compat_heading: bool = struct.field(pytree_node=False, default=False)

    def dyn_fcn(self, x, q, time):
        dt = self.dt
        tiny = jnp.asarray(1e-30, dtype=x.dtype)
        omega = x[4]
        om_safe = jnp.where(jnp.abs(omega) < tiny, tiny, omega)
        c = x[2] / om_safe
        heading_rate = x[3] if self.compat_heading else x[4]
        # turning branch (omega != 0)
        f_turn = jnp.stack([
            c * (jnp.sin(x[3] + omega * dt) - jnp.sin(x[3])) + 0.5 * dt ** 2 * jnp.cos(x[3]) * q[0],
            c * (-jnp.cos(x[3] + omega * dt) + jnp.cos(x[3])) + 0.5 * dt ** 2 * jnp.sin(x[3]) * q[0],
            dt * q[0],
            dt * heading_rate + 0.5 * dt ** 2 * q[1],
            dt * q[1],
        ])
        # straight-line branch (omega == 0), cf. ``ssmod.py:756-764``
        f_straight = jnp.stack([
            dt * x[2] * jnp.cos(x[3]),
            dt * x[2] * jnp.sin(x[3]),
            dt * q[0],
            dt * heading_rate + 0.5 * dt ** 2 * q[1],
            dt * q[1],
        ])
        f = jnp.where(jnp.abs(omega) < tiny, f_straight, f_turn)
        return x + f

    def dyn_fcn_cont(self, x, q, time):
        return jnp.stack([x[2] * jnp.cos(x[3]), x[2] * jnp.sin(x[3]),
                          jnp.zeros_like(x[0]), x[4], jnp.zeros_like(x[0])])


class ConstantVelocity(TransitionModel):
    """Constant-velocity model with noise gain (``ssmod.py:783-855``)."""

    dim_state = 4
    dim_noise = 2
    noise_additive = True

    dt: float = struct.field(pytree_node=False, default=0.1)

    @classmethod
    def create(cls, init_rv, noise_rv, noise_gain=None, dt: float = 0.1, **kwargs):
        if noise_gain is None:
            noise_gain = np.array([[dt ** 2 / 2, 0.0],
                                   [dt, 0.0],
                                   [0.0, dt ** 2 / 2],
                                   [0.0, dt]])
        return super().create(init_rv, noise_rv, noise_gain, dt=dt, **kwargs)

    def dyn_fcn(self, x, q, time):
        dt = self.dt
        Ax = jnp.stack([x[0] + dt * x[1], x[1], x[2] + dt * x[3], x[3]])
        return Ax + self.noise_gain @ q

    def dyn_fcn_cont(self, x, q, time):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Measurement models
# ---------------------------------------------------------------------------

class MeasurementModel(struct.PyTreeNode):
    """Base measurement model (cf. ``ssmod.py:863-1039``)."""

    noise_rv: GaussRV | StudentRV
    dim_state: int = struct.field(pytree_node=False)
    state_index: Optional[Tuple[int, ...]] = struct.field(pytree_node=False)

    # static per-class geometry (plain class attributes, see TransitionModel)
    dim_substate = 0
    dim_out = 0
    dim_noise = 0
    noise_additive = True

    @classmethod
    def create(cls, noise_rv, dim_state: int, state_index=None, **kwargs):
        if state_index is not None:
            state_index = tuple(int(i) for i in np.asarray(state_index).ravel())
            if not cls.noise_additive and len(state_index) != cls.dim_substate + cls.dim_noise:
                # the reference asserts this inside meas_eval (ssmod.py:1001);
                # without the check the gather silently drops the noise and
                # reuses a state entry in its place
                raise ValueError(
                    f"non-additive measurement models gather the AUGMENTED "
                    f"[state; noise] vector, so state_index must select "
                    f"dim_substate + dim_noise = {cls.dim_substate + cls.dim_noise} "
                    f"entries; got {len(state_index)}")
        return cls(noise_rv=noise_rv, dim_state=int(dim_state), state_index=state_index, **kwargs)

    @property
    def dim_in(self) -> int:
        """Input dim of the measurement function (``ssmod.py:907-908``)."""
        return self.dim_state if self.noise_additive else self.dim_state + self.dim_noise

    def meas_fcn(self, x, r, time):  # pragma: no cover - interface
        raise NotImplementedError

    def meas_fcn_dx(self, x, r, time):
        """Exact Jacobian of ``meas_fcn`` via AD.

        Like the reference's hand-coded Jacobians, non-additive models get
        the noise columns too (the reference scatters
        ``meas_fcn_dx[:, dim_substate:]`` into the noise block,
        ``ssmod.py:1001-1006``) — shape (dim_out, dim_substate + dim_noise)."""
        if self.noise_additive:
            return jnp.atleast_2d(jax.jacfwd(lambda v: self.meas_fcn(v, r, time))(x))
        d = self.dim_substate
        xr = jnp.concatenate([jnp.atleast_1d(x), jnp.atleast_1d(r)])
        return jnp.atleast_2d(jax.jacfwd(
            lambda v: self.meas_fcn(v[:d], v[d:], time))(xr))

    def meas_eval(self, xr, time):
        """Additivity dispatch + sub-state selection (``ssmod.py:960-1009``).

        The Jacobian scatter into full state dims of the reference
        (``ssmod.py:993-1006``) is obtained for free by AD through the gather.
        """
        if self.state_index is not None:
            xr = xr[jnp.array(self.state_index)]
        if self.noise_additive:
            zero_r = jnp.zeros((self.dim_noise,), dtype=xr.dtype)
            return self.meas_fcn(xr, zero_r, time)
        x, r = xr[: self.dim_substate], xr[-self.dim_noise:]
        return self.meas_fcn(x, r, time)

    def simulate_measurements(self, key, x: jax.Array) -> jax.Array:
        """Measurement simulation, ``scan x vmap`` (``ssmod.py:1011-1039``).

        ``x`` is (dim_state, steps, mc_sims); measurement at array index ``k``
        carries time stamp ``k+1`` like the reference.
        """
        if self.state_index is not None:
            x = x[jnp.array(self.state_index)]
        _, steps, mc_sims = x.shape
        r = self.noise_rv.sample(key, (steps, mc_sims))           # (Dr, steps, M)

        meas = jax.vmap(self.meas_fcn, in_axes=(1, 1, None), out_axes=1)

        def step(_, inp):
            x_k, r_k, k = inp
            return None, meas(x_k, r_k, k + 1)

        xs = (jnp.moveaxis(x, 1, 0), jnp.moveaxis(r, 1, 0), jnp.arange(steps))
        _, ys = jax.lax.scan(step, None, xs)
        return jnp.moveaxis(ys, 0, 1)


class UNGMMeasurement(MeasurementModel):
    """``z = 0.05 x^2 + r`` (``ssmod.py:1042-1064``)."""

    dim_substate = 1
    dim_out = 1
    dim_noise = 1
    noise_additive = True

    def meas_fcn(self, x, r, time):
        return 0.05 * x ** 2 + r


class UNGMNAMeasurement(MeasurementModel):
    """``z = 0.05 x^2 r`` — non-additive (``ssmod.py:1067-1089``)."""

    dim_substate = 1
    dim_out = 1
    dim_noise = 1
    noise_additive = False

    def meas_fcn(self, x, r, time):
        return 0.05 * r * x ** 2


class Pendulum2DMeasurement(MeasurementModel):
    """``z = sin(alpha) + r`` (``ssmod.py:1092-1118``)."""

    dim_substate = 1
    dim_out = 1
    dim_noise = 1
    noise_additive = True

    def meas_fcn(self, x, r, time):
        return jnp.sin(x[:1]) + r


class RangeMeasurement(MeasurementModel):
    """Range to a vertically falling body (``ssmod.py:1121-1152``)."""

    dim_substate = 1
    dim_out = 1
    dim_noise = 1
    noise_additive = True

    sx: float = struct.field(pytree_node=False, default=30.0)
    sy: float = struct.field(pytree_node=False, default=30.0)

    def meas_fcn(self, x, r, time):
        rng = jnp.sqrt(self.sx ** 2 + (x[0] - self.sy) ** 2)
        return rng[None] + r


@functools.lru_cache(maxsize=None)
def _bearing_class(base, num_sensors: int):
    """Per-sensor-count BearingMeasurement subclass, cached so equal-count
    instances share one pytree treedef (jit cache key)."""
    return type(f"BearingMeasurement{num_sensors}", (base,),
                {"dim_out": num_sensors, "dim_noise": num_sensors})


class BearingMeasurement(MeasurementModel):
    """S bearing sensors, atan2 measurements (``ssmod.py:1155-1198``)."""

    dim_substate = 2
    dim_out = 0       # set per instance via class factory below
    dim_noise = 0
    noise_additive = True

    sensor_pos: jax.Array = struct.field(default=None)

    @classmethod
    def create(cls, noise_rv, dim_state: int, state_index=None, sensor_pos=None):
        if sensor_pos is None:
            sensor_pos = np.vstack((np.eye(2), -np.eye(2)))
        sensor_pos = jnp.asarray(sensor_pos, dtype=noise_rv.mean.dtype)
        # dim_out/dim_noise depend on the sensor count -> specialize the
        # class, CACHED per sensor count: a fresh type per call would make
        # every instance a distinct pytree treedef, defeating jit caching
        # (one recompile per instance) and cross-instance stacking
        sub = _bearing_class(cls, int(sensor_pos.shape[0]))
        return MeasurementModel.create.__func__(
            sub, noise_rv, dim_state, state_index, sensor_pos=sensor_pos)

    def meas_fcn(self, x, r, time):
        dx = x[0] - self.sensor_pos[:, 0]
        dy = x[1] - self.sensor_pos[:, 1]
        return jnp.arctan2(dy, dx) + r


class Radar2DMeasurement(MeasurementModel):
    """Range + bearing radar (``ssmod.py:1201-1255``)."""

    dim_substate = 2
    dim_out = 2
    dim_noise = 2
    noise_additive = True

    radar_loc: jax.Array = struct.field(default=None)

    @classmethod
    def create(cls, noise_rv, dim_state: int, state_index=None, radar_loc=None):
        if radar_loc is None:
            radar_loc = np.zeros(2)
        # get_stats()[0] is the mean for every RV flavour (incl. mixtures)
        radar_loc = jnp.asarray(radar_loc, dtype=noise_rv.get_stats()[0].dtype)
        return super().create(noise_rv, dim_state, state_index, radar_loc=radar_loc)

    def meas_fcn(self, x, r, time):
        dx = x[0] - self.radar_loc[0]
        dy = x[1] - self.radar_loc[1]
        rng = jnp.sqrt(dx ** 2 + dy ** 2)
        theta = jnp.arctan2(dy, dx)
        return jnp.stack([rng, theta]) + r
