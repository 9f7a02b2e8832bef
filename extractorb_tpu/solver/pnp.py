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


def _score(R, t, p3d, xy, valid, th2):
    pc = p3d @ R.T + t
    zok = pc[:, 2] > 1e-6
    proj = pc[:, :2] / jnp.where(zok, pc[:, 2], 1.0)[:, None]
    err2 = jnp.sum((proj - xy) ** 2, -1)
    inl = valid & zok & (err2 < th2)
    return inl, jnp.sum(inl)


@partial(jax.jit, static_argnames=("n_hypotheses", "min_inliers"))
def ransac_pnp(
    p3d,
    xy,
    valid,
    key,
    th=0.01,
    n_hypotheses=256,
    min_inliers=15,
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
    Rs, ts = jax.vmap(_dlt_pose)(p3s, xys)
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
