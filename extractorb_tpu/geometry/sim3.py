"""Sim3 estimation between keyframes (loop closing).

Replaces Sim3Solver (reference: inc/Sim3Solver.h:37-61,
src/Sim3Solver.cc): Horn 1987 closed-form similarity from 3 point
correspondences inside a RANSAC loop, inliers checked by reprojection in
both images.

TPU design: all RANSAC hypotheses are one vmapped batch — each computes
the Horn alignment via the 4x4 quaternion eigen problem (batched eigh)
— and all correspondences are scored against all hypotheses at once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    R12: jnp.ndarray      # (3,3)
    t12: jnp.ndarray      # (3,)
    s12: jnp.ndarray      # ()
    inliers: jnp.ndarray  # (N,) bool


def horn_sim3(p1, p2, fix_scale: bool = False):
    """Closed-form s,R,t with p2 ~= s R p1 + t.  p1/p2: (M,3)."""
    c1 = p1.mean(0)
    c2 = p2.mean(0)
    x1 = p1 - c1
    x2 = p2 - c2
    M = x1.T @ x2  # (3,3) cross-dispersion S_ab = sum x1_a x2_b (Horn)
    # N matrix (4x4 symmetric), largest eigenvector = quaternion (w,x,y,z)
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    w, v = jnp.linalg.eigh(N)
    q = v[:, -1]  # largest eigenvalue
    R = lie.quat_to_rot(q)
    if fix_scale:
        s = jnp.asarray(1.0, p1.dtype)
    else:
        # Horn's symmetric scale: sqrt(sum|x2|^2 / sum|x1|^2)
        s = jnp.sqrt(
            jnp.sum(x2 * x2) / jnp.maximum(jnp.sum(x1 * x1), 1e-12)
        )
    t = c2 - s * (R @ c1)
    return R, t, s


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def solve_sim3_ransac(
    key,
    p3d_1,        # (N,3) points in camera-1 frame
    p3d_2,        # (N,3) corresponding points in camera-2 frame
    uv1, uv2,     # (N,2) observed pixels in each image
    valid,        # (N,)
    project,      # cam point -> pixel
    fix_scale: bool = False,
    n_hyp: int = 128,
    th2: float = 9.21,   # chi2(2) at 99% like the reference defaults
):
    """Batched RANSAC Sim3: returns the best hypothesis + inliers.

    Inlier check: reproject each 3D point through the hypothesised Sim3
    into the OTHER camera and threshold squared pixel error in both
    directions (reference CheckInliers, Sim3Solver.cc).
    """
    n = p3d_1.shape[0]

    def sample(k):
        p = jax.random.uniform(k, (n,)) + (~valid) * 10.0
        return jnp.argsort(p)[:3]

    sets = jax.vmap(sample)(jax.random.split(key, n_hyp))

    def hyp(idx):
        R, t, s = horn_sim3(p3d_1[idx], p3d_2[idx], fix_scale)
        # project points 1 into image 2: p2' = s R p1 + t
        p2p = s * (p3d_1 @ R.T) + t
        uv2p = jax.vmap(project)(p2p)
        e2 = jnp.sum((uv2p - uv2) ** 2, -1)
        # inverse transform: p1' = (1/s) R^T (p2 - t)
        Rt, tt, st = lie.sim3_inverse(R, t, s)
        p1p = st * (p3d_2 @ Rt.T) + tt
        uv1p = jax.vmap(project)(p1p)
        e1 = jnp.sum((uv1p - uv1) ** 2, -1)
        inl = valid & (e1 < th2) & (e2 < th2) & (p2p[:, 2] > 0) & (p1p[:, 2] > 0)
        return inl.sum(), R, t, s, inl

    counts, Rs, ts, ss, inls = jax.vmap(hyp)(sets)
    best = jnp.argmax(counts)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    ok = counts[best] >= jnp.maximum(20, (0.4 * n_valid).astype(jnp.int32))
    return Sim3Result(
        success=ok, R12=Rs[best], t12=ts[best], s12=ss[best],
        inliers=inls[best],
    )
