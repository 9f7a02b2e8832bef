"""Lie-group operations on SO(3), SE(3), Sim(3).

Replaces the reference's scattered SO3 utilities (ExpSO3/LogSO3/
RightJacobianSO3, src/ImuTypes.cc:30-151) and the g2o SE3Quat/Sim3 types
(Thirdparty/g2o) with pure-jnp, vmappable, differentiable functions.

Conventions: rotations are 3x3 matrices; SE(3) is (R, t); Sim(3) is
(R, t, s).  Tangent ordering for SE(3) is (rho, phi) = (translation,
rotation), matching the right-multiplicative update T * Exp(xi) used by
the solver.  All ops are Taylor-guarded near theta=0 so gradients are
finite everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat: (...,3) -> (...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def vee(W):
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def _safe_theta(w):
    """(theta2, theta_safe, small): differentiation-safe angle helpers.

    theta_safe equals theta where theta >= 1e-4 and 1.0 in the small
    branch, with the sqrt argument itself guarded so jacfwd/jacrev never
    see d(sqrt)/dx at 0 (which would poison gradients with NaN).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    return theta2, theta, small


def _sin_over_x(x):
    """sin(x)/x, Taylor-safe."""
    x2 = x * x
    small = 1.0 - x2 / 6.0 + x2 * x2 / 120.0
    return jnp.where(jnp.abs(x) < 1e-4, small, jnp.sin(x) / jnp.where(jnp.abs(x) < 1e-4, 1.0, x))


def _one_minus_cos_over_x2(x):
    """(1-cos x)/x^2, Taylor-safe."""
    x2 = x * x
    small = 0.5 - x2 / 24.0 + x2 * x2 / 720.0
    return jnp.where(jnp.abs(x) < 1e-4, small, (1.0 - jnp.cos(x)) / jnp.where(jnp.abs(x) < 1e-4, 1.0, x2))


def so3_exp(w):
    """Exponential map so(3) -> SO(3) (Rodrigues). (...,3) -> (...,3,3).

    Differentiable everywhere including w = 0 (jvp-safe guards)."""
    theta2, theta, small = _safe_theta(w)
    W = hat(w)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R):
    """Log map SO(3) -> so(3). (...,3,3) -> (...,3).

    Via the Shepperd quaternion (rot_to_quat), which is numerically stable
    in every regime including theta ~ pi; then w = 2 atan2(|v|, qw) v/|v|
    with a Taylor guard at |v| ~ 0.
    """
    q = rot_to_quat(R)  # (w, x, y, z), w >= 0
    qw = q[..., 0]
    v = q[..., 1:]
    # jvp-safe at v = 0: work with the squared norm (smooth everywhere)
    # and guard the sqrt INSIDE the where so neither branch's tangent
    # contains d|v|/dv = v/|v| (NaN at the origin); norm's raw jvp would
    # otherwise poison the Taylor branch via 0 * NaN.
    nv2 = jnp.sum(v * v, axis=-1)
    small = nv2 < 1e-12
    safe_nv = jnp.sqrt(jnp.where(small, 1.0, nv2))
    theta = 2.0 * jnp.arctan2(safe_nv, qw)
    # factor = theta / nv; Taylor for nv->0 (qw ~ 1): 2/qw * (1 - nv^2/(3 qw^2))
    safe_qw = jnp.maximum(qw, _EPS)
    factor = jnp.where(
        small,
        2.0 / safe_qw * (1.0 - nv2 / (3.0 * safe_qw * safe_qw)),
        theta / safe_nv,
    )
    return factor[..., None] * v


def so3_right_jacobian(w):
    """Right Jacobian of SO(3) (reference: RightJacobianSO3, ImuTypes.cc:119).

    jvp-safe at w = 0."""
    theta2, theta, small = _safe_theta(w)
    W = hat(w)
    safe_t2 = jnp.where(small, 1.0, theta2)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (safe_t2 * theta),
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - b[..., None, None] * W + c[..., None, None] * (W @ W)


def so3_right_jacobian_inv(w):
    """Inverse right Jacobian (reference: InverseRightJacobianSO3, ImuTypes.cc:135).

    jvp-safe at w = 0."""
    theta2, theta, small = _safe_theta(w)
    W = hat(w)
    safe_t2 = jnp.where(small, 1.0, theta2)
    safe_sin = jnp.where(small, 1.0, theta * jnp.sin(theta))
    generic = 1.0 / safe_t2 - (1.0 + jnp.cos(theta)) / (2.0 * safe_sin)
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, generic)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + 0.5 * W + c[..., None, None] * (W @ W)


def normalize_rotation(R):
    """Project a near-rotation onto SO(3) via SVD (reference: NormalizeRotation,
    ImuTypes.cc:146)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones(R.shape[:-2] + (2,), R.dtype), det[..., None]], axis=-1
    )
    return (U * D[..., None, :]) @ Vt


def orthonormalize(R):
    """Cheap SO(3) re-projection for NEAR-orthonormal inputs (two
    Newton-Schulz iterations, batched over leading dims).

    Multiplicative pose updates (R @ Exp(delta)) preserve any
    non-orthonormality of R, and the device-chained motion prediction
    uses R.T as the inverse — for a distorted R that feeds the
    distortion back SQUARED, so f32 roundoff compounds exponentially
    across a tracked sequence unless every program's output rotation is
    re-projected.  Solver outputs call this; it converges quadratically
    for singular values in (0, sqrt(3)) and costs three 3x3 matmuls per
    iteration (vs a full SVD for arbitrary inputs: normalize_rotation).
    """
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    for _ in range(2):
        R = R @ (1.5 * I3 - 0.5 * (jnp.swapaxes(R, -1, -2) @ R))
    return R


# ---------------------------------------------------------------- SE(3)


def se3_exp(xi):
    """se(3) -> SE(3).  xi = (rho, phi): (...,6) -> (R (...,3,3), t (...,3))."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def so3_left_jacobian(w):
    """Left Jacobian J_l(w) = J_r(-w)."""
    return so3_right_jacobian(-w)


def se3_log(R, t):
    """SE(3) -> se(3): (...,6) with (rho, phi) ordering."""
    phi = so3_log(R)
    Vinv = so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def so3_left_jacobian_inv(w):
    return so3_right_jacobian_inv(-w)


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb)."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_apply(R, t, p):
    """Transform points p (...,3)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def se3_matrix(R, t):
    """(R,t) -> 4x4 homogeneous matrix."""
    bottom = jnp.zeros(R.shape[:-2] + (1, 4), R.dtype).at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T):
    return T[..., :3, :3], T[..., :3, 3]


# ---------------------------------------------------------------- Sim(3)


def sim3_apply(R, t, s, p):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


def sim3_inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), s_inv


def sim3_compose(Ra, ta, sa, Rb, tb, sb):
    """(Ra,ta,sa) * (Rb,tb,sb): x -> sa Ra (sb Rb x + tb) + ta."""
    return (
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
        sa * sb,
    )


def sim3_exp(xi):
    """sim(3) -> Sim(3).  xi = (rho, phi, sigma): (...,7).

    Uses the closed-form W matrix (Strasdat's thesis) with Taylor guards.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    theta = jnp.linalg.norm(phi, axis=-1)
    W = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)

    # Coefficients for V = A*I + B*W + C*W^2 with scale coupling.
    # Following Sophus Sim3 exp: see sophus/sim3.hpp logic.
    eps = 1e-5
    s_small = jnp.abs(sigma) < eps
    t_small = theta < eps
    safe_sigma = jnp.where(s_small, 1.0, sigma)
    safe_theta = jnp.where(t_small, 1.0, theta)
    theta2 = theta * theta

    # A = (s-1)/sigma  (sigma->0: 1)
    A = jnp.where(s_small, 1.0 + 0.5 * sigma, (s - 1.0) / safe_sigma)

    c = jnp.cos(theta)
    si = jnp.sin(theta)
    # generic both:
    a_gen = s * si
    b_gen = s * c
    denom = sigma * sigma + theta2
    safe_denom = jnp.where((s_small & t_small), 1.0, denom)
    B_gen = (a_gen * sigma + (1.0 - b_gen) * theta) / (safe_theta * safe_denom)
    C_gen = (A - (b_gen - 1.0) * sigma / safe_denom - a_gen * theta / safe_denom) / jnp.where(
        t_small, 1.0, theta2
    )
    # sigma small, theta generic:
    B_s0 = _one_minus_cos_over_x2(theta)
    # (theta - sin)/theta^3:
    C_s0 = jnp.where(
        t_small,
        1.0 / 6.0,
        (theta - si) / jnp.where(t_small, 1.0, theta2 * safe_theta),
    )
    # theta small, sigma generic:
    B_t0 = jnp.where(
        s_small, 0.5, ((sigma - 1.0) * s + 1.0) / (safe_sigma * safe_sigma)
    )
    C_t0 = jnp.where(
        s_small,
        1.0 / 6.0,
        ((0.5 * sigma * sigma - sigma + 1.0) * s - 1.0)
        / (safe_sigma * safe_sigma * safe_sigma),
    )
    B = jnp.where(t_small, B_t0, jnp.where(s_small, B_s0, B_gen))
    C = jnp.where(t_small, C_t0, jnp.where(s_small, C_s0, C_gen))
    V = A[..., None, None] * I + B[..., None, None] * W + C[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t, s


def quat_to_rot(q):
    """Unit quaternion (w,x,y,z) -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def rot_to_quat(R):
    """Rotation matrix -> unit quaternion (w,x,y,z), w>=0.

    Branch-free Shepperd-style selection of the most stable component.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate quaternions (unnormalised), one per pivot.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)
    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], -1)
    k = jnp.argmax(pivots, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], -2)  # (...,4 pivot,4 comp)
    q = jnp.take_along_axis(cand, k[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    sgn = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q * sgn


def sim3_log(R, t, s):
    """Sim(3) -> sim(3): (..., 7) as (rho, phi, sigma).

    Inverse of sim3_exp: phi = Log(R), sigma = log(s), rho = W^-1 t where
    W is the same A*I + B*hat(phi) + C*hat(phi)^2 matrix used in the exp
    (solved as a 3x3 linear system).
    """
    phi = so3_log(R)
    sigma = jnp.log(s)
    xi = jnp.concatenate(
        [jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1
    )
    # recover W by evaluating exp's V at (phi, sigma): reuse sim3_exp's
    # internals through a unit probe — cheaper: rebuild coefficients.
    _, t_probe_x, _ = sim3_exp(
        jnp.concatenate(
            [jnp.ones_like(phi[..., :1]), jnp.zeros_like(phi[..., :2]), phi,
             sigma[..., None]], -1
        )
    )
    _, t_probe_y, _ = sim3_exp(
        jnp.concatenate(
            [jnp.zeros_like(phi[..., :1]), jnp.ones_like(phi[..., :1]),
             jnp.zeros_like(phi[..., :1]), phi, sigma[..., None]], -1
        )
    )
    _, t_probe_z, _ = sim3_exp(
        jnp.concatenate(
            [jnp.zeros_like(phi[..., :2]), jnp.ones_like(phi[..., :1]), phi,
             sigma[..., None]], -1
        )
    )
    W = jnp.stack([t_probe_x, t_probe_y, t_probe_z], axis=-1)  # columns
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
