"""On-manifold IMU preintegration.

Replaces IMU::Preintegrated (reference: src/ImuTypes.cc:255-311
IntegrateNewMeasurement, :225 Initialize, :357-428 bias-corrected
getters) with a lax.scan over the measurement window — batchable across
frames with vmap, differentiable for the inertial residuals of the
solver.

State: (dR, dV, dP), 15x15 covariance C (order: rot, vel, pos, gyro
bias, acc bias — matching the reference), bias Jacobians JRg, JVg, JVa,
JPg, JPa, total time dT.  The update order follows the reference exactly
(position first with the NON-updated rotation, rotation last).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class Preintegrated(NamedTuple):
    dR: jnp.ndarray      # (3,3)
    dV: jnp.ndarray      # (3,)
    dP: jnp.ndarray      # (3,)
    C: jnp.ndarray       # (15,15) covariance
    JRg: jnp.ndarray     # (3,3) d dR / d gyro bias
    JVg: jnp.ndarray
    JVa: jnp.ndarray
    JPg: jnp.ndarray
    JPa: jnp.ndarray
    dT: jnp.ndarray      # () total time
    bias: jnp.ndarray    # (6,) (bg, ba) used at integration time


def init_preintegrated(bias=None, dtype=jnp.float32) -> Preintegrated:
    """Reference Preintegrated::Initialize (ImuTypes.cc:225)."""
    z3 = jnp.zeros((3, 3), dtype)
    return Preintegrated(
        dR=jnp.eye(3, dtype=dtype),
        dV=jnp.zeros(3, dtype),
        dP=jnp.zeros(3, dtype),
        C=jnp.zeros((15, 15), dtype),
        JRg=z3, JVg=z3, JVa=z3, JPg=z3, JPa=z3,
        dT=jnp.zeros((), dtype),
        bias=jnp.zeros(6, dtype) if bias is None else bias,
    )


def integrate(
    gyro: jnp.ndarray,      # (T,3)
    acc: jnp.ndarray,       # (T,3)
    dts: jnp.ndarray,       # (T,)
    valid: jnp.ndarray,     # (T,) bool (padding mask)
    bias: jnp.ndarray,      # (6,) (bg, ba)
    noise_gyro: float,
    noise_acc: float,
    walk_gyro: float,
    walk_acc: float,
) -> Preintegrated:
    """Scan IntegrateNewMeasurement over a (padded) measurement window."""
    dtype = acc.dtype
    Nga = jnp.diag(
        jnp.asarray(
            [noise_gyro**2] * 3 + [noise_acc**2] * 3, dtype
        )
    )
    NgaWalk = jnp.diag(
        jnp.asarray([walk_gyro**2] * 3 + [walk_acc**2] * 3, dtype)
    )
    bg, ba = bias[:3], bias[3:]

    def step(s: Preintegrated, x):
        w, a, dt, ok = x
        a_c = a - ba
        w_c = w - bg

        dP = s.dP + s.dV * dt + 0.5 * s.dR @ a_c * dt * dt
        dV = s.dV + s.dR @ a_c * dt

        Wacc = lie.hat(a_c)
        dRdt = s.dR * dt

        JPa = s.JPa + s.JVa * dt - 0.5 * dRdt * dt
        JPg = s.JPg + s.JVg * dt - 0.5 * dRdt * dt @ Wacc @ s.JRg
        JVa = s.JVa - dRdt
        JVg = s.JVg - dRdt @ Wacc @ s.JRg

        dRi = lie.so3_exp(w_c * dt)
        rightJ = lie.so3_right_jacobian(w_c * dt)
        dR = lie.normalize_rotation(s.dR @ dRi)

        # covariance propagation: A (9,9), B (9,6)
        A = jnp.eye(9, dtype=dtype)
        A = A.at[0:3, 0:3].set(dRi.T)
        A = A.at[3:6, 0:3].set(-dRdt @ Wacc)
        A = A.at[6:9, 0:3].set(-0.5 * dRdt * dt @ Wacc)
        A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=dtype) * dt)
        B = jnp.zeros((9, 6), dtype)
        B = B.at[0:3, 0:3].set(rightJ * dt)
        B = B.at[3:6, 3:6].set(dRdt)
        B = B.at[6:9, 3:6].set(0.5 * dRdt * dt)

        C9 = A @ s.C[:9, :9] @ A.T + B @ Nga @ B.T
        C = s.C.at[:9, :9].set(C9)
        C = C.at[9:, 9:].set(s.C[9:, 9:] + NgaWalk)

        JRg = dRi.T @ s.JRg - rightJ * dt

        new = Preintegrated(
            dR=dR, dV=dV, dP=dP, C=C,
            JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
            dT=s.dT + dt, bias=s.bias,
        )
        # masked (padding) steps keep the old state
        out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, s
        )
        return out, None

    s0 = init_preintegrated(bias, dtype)
    s, _ = jax.lax.scan(step, s0, (gyro, acc, dts, valid))
    return s


def delta_rotation(p: Preintegrated, new_bias: jnp.ndarray):
    """GetDeltaRotation(b') = dR Exp(JRg (bg'-bg)) (ImuTypes.cc:357).

    No SVD re-normalization: this is differentiated inside the inertial
    residuals and the SVD jacobian is NaN at a rotation's repeated
    singular values; p.dR is normalized at integration time."""
    dbg = new_bias[:3] - p.bias[:3]
    return p.dR @ lie.so3_exp(p.JRg @ dbg)


def delta_velocity(p: Preintegrated, new_bias: jnp.ndarray):
    dbg = new_bias[:3] - p.bias[:3]
    dba = new_bias[3:] - p.bias[3:]
    return p.dV + p.JVg @ dbg + p.JVa @ dba


def delta_position(p: Preintegrated, new_bias: jnp.ndarray):
    dbg = new_bias[:3] - p.bias[:3]
    dba = new_bias[3:] - p.bias[3:]
    return p.dP + p.JPg @ dbg + p.JPa @ dba


def inertial_residual(
    p: Preintegrated,
    R1, t1, v1, R2, t2, v2,
    bias_new,
    gravity=None,
):
    """9-dim preintegration residual (the EdgeInertial error,
    reference src/G2oTypes.cc EdgeInertial::computeError): poses are
    body-in-world (Rwb, twb)."""
    g = jnp.asarray([0.0, 0.0, -9.81], R1.dtype) if gravity is None else gravity
    dT = p.dT
    eR = lie.so3_log(
        delta_rotation(p, bias_new).T @ (R1.T @ R2)
    )
    eV = R1.T @ (v2 - v1 - g * dT) - delta_velocity(p, bias_new)
    eP = R1.T @ (t2 - t1 - v1 * dT - 0.5 * g * dT * dT) - delta_position(
        p, bias_new
    )
    return jnp.concatenate([eR, eV, eP])
