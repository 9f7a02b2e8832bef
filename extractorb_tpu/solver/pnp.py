"""Batched RANSAC PnP for relocalization.

TPU-native replacement for the reference's RANSAC PnP solvers
(`inc/PnPsolver.h:60-92` EPnP, `inc/MLPnPsolver.h:59-157` MLPnP — the
one Relocalization actually uses, `src/Tracking.cc:3184` region).  Both
reference solvers draw random minimal sets sequentially and iterate
until enough inliers; here all hypotheses are drawn up front and solved
as ONE batched linear-algebra program (vmap over hypotheses, batched
12x12 SVD on the MXU, dense inlier scoring), then the winner is refined
with the shared LM pose optimizer (`solver/pose_opt.py`).

Like MLPnP, the solver operates on normalized bearing-plane coordinates
(x/z, y/z after camera unprojection), so it is camera-model agnostic
(pinhole and KB8 fisheye both reduce to the same problem).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

MIN_SAMPLE = 6  # DLT minimal set (12 unknowns / 2 eqs per point)


class PnPResult(NamedTuple):
    R: jnp.ndarray        # [3,3]
    t: jnp.ndarray        # [3]
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray  # scalar int
    ok: jnp.ndarray       # scalar bool


def _dlt_pose(p3d, xy):
    """Direct linear transform for P=[R|t] from 6+ correspondences.

    p3d: [S,3] world points, xy: [S,2] normalized image coords.
    Returns (R, t) with R orthogonalized by Procrustes and the sign
    fixed so the sample centroid has positive depth.
    """
    S = p3d.shape[0]
    X = jnp.concatenate([p3d, jnp.ones((S, 1), p3d.dtype)], -1)  # [S,4]
    z = jnp.zeros((S, 4), p3d.dtype)
    # rows: [X 0 -x*X ; 0 X -y*X]
    r1 = jnp.concatenate([X, z, -xy[:, :1] * X], -1)
    r2 = jnp.concatenate([z, X, -xy[:, 1:2] * X], -1)
    A = jnp.concatenate([r1, r2], 0)  # [2S,12]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    p = vt[-1]  # [12]
    P = p.reshape(3, 4)

    def orth(M):
        # nearest SO(3) to M (Procrustes) + positive scale
        u, s, vtm = jnp.linalg.svd(M)
        d = jnp.linalg.det(u @ vtm)
        R = u @ jnp.diag(jnp.array([1.0, 1.0, 0.0], M.dtype)
                         + jnp.array([0.0, 0.0, 1.0], M.dtype) * d) @ vtm
        return R, jnp.maximum(jnp.mean(s), 1e-12)

    # P is defined up to sign: build both candidates, keep the one that
    # puts the sample centroid at positive depth.
    Ra, sa = orth(P[:, :3])
    Rb, sb = orth(-P[:, :3])
    ta = P[:, 3] / sa
    tb = -P[:, 3] / sb
    c = jnp.mean(p3d, 0)
    za = (Ra @ c + ta)[2]
    use_a = za > 0
    R = jnp.where(use_a, Ra, Rb)
    t = jnp.where(use_a, ta, tb)
    return R, t


def _epnp_pose(p3d, xy):
    """EPnP (reference inc/PnPsolver.h:60-92) for one minimal sample,
    batched via vmap: 4 control points (centroid + PCA axes), barycentric
    coordinates, the 2S x 12 system's null vector as the camera-frame
    control points (the N=1 beta case), scale fixed by inter-control
    distance consistency, sign by cheirality, and the final (R, t) from
    a closed-form rigid alignment (Horn) of the camera-frame points onto
    the world sample.

    p3d: [S,3] world points, xy: [S,2] normalized image coords.
    Far more noise-robust than the 6-point DLT: the control-point
    parametrization confines the solution to a 12-dim subspace aligned
    with the sample's geometry instead of a raw projective P.
    """
    S = p3d.shape[0]
    dtype = p3d.dtype
    c0 = jnp.mean(p3d, 0)
    X = p3d - c0
    cov = X.T @ X / S
    w, V = jnp.linalg.eigh(cov)  # ascending
    # principal axes scaled by sqrt(eigenvalue); floor for (near-)planar
    # samples so the 4th control point stays affinely independent
    s_ax = jnp.sqrt(jnp.maximum(w, 1e-8))
    C_w = jnp.concatenate(
        [c0[None], c0[None] + (V * s_ax[None, :]).T], 0
    )  # [4,3] control points: centroid + 3 axes

    # barycentric coordinates: [C_w^T;1] alpha = [p;1]
    A4 = jnp.concatenate(
        [C_w.T, jnp.ones((1, 4), dtype)], 0
    )  # [4,4]
    rhs = jnp.concatenate([p3d.T, jnp.ones((1, S), dtype)], 0)  # [4,S]
    alpha = jnp.linalg.solve(A4, rhs).T  # [S,4]

    # M (2S x 12): alpha_j * [1 0 -u; 0 1 -v] per control point
    u = xy[:, 0:1]
    v = xy[:, 1:2]
    z = jnp.zeros_like(u)
    o = jnp.ones_like(u)
    rows_u = (alpha[:, :, None] * jnp.concatenate([o, z, -u], -1)[:, None, :])
    rows_v = (alpha[:, :, None] * jnp.concatenate([z, o, -v], -1)[:, None, :])
    M = jnp.concatenate(
        [rows_u.reshape(S, 12), rows_v.reshape(S, 12)], 0
    )  # [2S,12]
    _, _, vt = jnp.linalg.svd(M, full_matrices=True)
    Cc = vt[-1].reshape(4, 3)  # camera-frame control points, up to scale

    # scale from control-point distance consistency (beta, N=1 case)
    ii, jj = jnp.triu_indices(4, 1)
    d_c = jnp.linalg.norm(Cc[ii] - Cc[jj], axis=-1)
    d_w = jnp.linalg.norm(C_w[ii] - C_w[jj], axis=-1)
    beta = jnp.sum(d_w * d_c) / jnp.maximum(jnp.sum(d_c * d_c), 1e-12)
    Cc = Cc * beta
    pc = alpha @ Cc  # [S,3] camera-frame sample points
    # cheirality: flip if the solution puts the cloud behind the camera
    pc = jnp.where(jnp.mean(pc[:, 2]) < 0, -pc, pc)

    # rigid alignment p_c = R p_w + t (Horn, fixed scale)
    mu_w = jnp.mean(p3d, 0)
    mu_c = jnp.mean(pc, 0)
    H = (p3d - mu_w).T @ (pc - mu_c)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype)
                 + jnp.array([0.0, 0.0, 1.0], dtype) * d)
    R = Vt.T @ D @ U.T
    t = mu_c - R @ mu_w
    return R, t


def _score(R, t, p3d, xy, valid, th2):
    pc = p3d @ R.T + t
    zok = pc[:, 2] > 1e-6
    proj = pc[:, :2] / jnp.where(zok, pc[:, 2], 1.0)[:, None]
    err2 = jnp.sum((proj - xy) ** 2, -1)
    inl = valid & zok & (err2 < th2)
    return inl, jnp.sum(inl)


@partial(jax.jit, static_argnames=("n_hypotheses", "min_inliers", "solver"))
def ransac_pnp(
    p3d,
    xy,
    valid,
    key,
    th=0.01,
    n_hypotheses=256,
    min_inliers=15,
    solver: str = "epnp",
):
    """RANSAC PnP: p3d [N,3] world points, xy [N,2] normalized bearing
    coords, valid [N] mask.  th is the inlier threshold in normalized
    image units (~pixels / focal length).

    All hypotheses are solved and scored in parallel (batched SVD +
    one [H,N] scoring pass) — the TPU replacement for the reference's
    sequential `PnPsolver::iterate` loop.
    """
    N = p3d.shape[0]
    nvalid = jnp.sum(valid)
    # sample weighted toward valid entries: draw uniform over N but
    # reject invalid by re-rolling via categorical over the mask
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(
        key, logits[None, None, :], axis=-1,
        shape=(n_hypotheses, MIN_SAMPLE),
    )  # [H,6]
    p3s = p3d[idx]          # [H,6,3]
    xys = xy[idx]           # [H,6,2]
    minimal = _epnp_pose if solver == "epnp" else _dlt_pose
    Rs, ts = jax.vmap(minimal)(p3s, xys)
    th2 = th * th
    inls, counts = jax.vmap(lambda R, t: _score(R, t, p3d, xy, valid, th2))(Rs, ts)
    best = jnp.argmax(counts)
    R, t, inliers, n_inl = Rs[best], ts[best], inls[best], counts[best]
    ok = (n_inl >= min_inliers) & (nvalid >= MIN_SAMPLE)
    return PnPResult(R, t, inliers, n_inl, ok)


def refine_pnp(result: PnPResult, p3d, xy, project, inv_sigma2=None):
    """LM refinement of the RANSAC winner on its inlier set using the
    shared robust pose optimizer (reference: PnPsolver GN refine +
    PoseOptimization follow-up in Relocalization)."""
    from extractorb_tpu.solver import pose_opt as spo

    N = p3d.shape[0]
    if inv_sigma2 is None:
        inv_sigma2 = jnp.ones((N,), jnp.float32)
    return spo.optimize_pose(
        result.R, result.t, p3d, xy, inv_sigma2, result.inliers, project,
    )
