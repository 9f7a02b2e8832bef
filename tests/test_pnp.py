"""RANSAC PnP (relocalization solver) tests: synthetic pose recovery
with outliers — the check the reference never automates for its
PnPsolver/MLPnPsolver (it only exercises them live in Relocalization).
"""

import jax
import jax.numpy as jnp
import numpy as np

from extractorb_tpu.core import lie
from extractorb_tpu.solver import pnp


def _scene(rng, n=200, n_out=60):
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)],
        -1,
    ).astype(np.float32)
    w = np.array([0.1, -0.2, 0.05], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = np.array([0.3, -0.1, 0.5], np.float32)
    pc = pts @ R.T + t
    xy = pc[:, :2] / pc[:, 2:3]
    xy += rng.normal(0, 0.001, xy.shape).astype(np.float32)
    out_idx = rng.choice(n, n_out, replace=False)
    xy[out_idx] += rng.uniform(0.1, 0.5, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return pts, xy.astype(np.float32), R, t, out_idx


def test_ransac_pnp_recovers_pose(rng):
    pts, xy, R, t, out_idx = _scene(rng)
    valid = np.ones(len(pts), bool)
    res = pnp.ransac_pnp(
        jnp.asarray(pts), jnp.asarray(xy), jnp.asarray(valid),
        jax.random.PRNGKey(0),
    )
    assert bool(res.ok)
    assert int(res.n_inliers) > 100
    # recovered rotation within ~1 deg, translation within 5cm
    dR = np.asarray(res.R) @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 2.0, ang
    assert np.linalg.norm(np.asarray(res.t) - t) < 0.1
    # outliers are (mostly) excluded
    inl = np.asarray(res.inliers)
    assert inl[out_idx].mean() < 0.2


def test_ransac_pnp_refine_tightens(rng):
    pts, xy, R, t, _ = _scene(rng)
    valid = np.ones(len(pts), bool)
    res = pnp.ransac_pnp(
        jnp.asarray(pts), jnp.asarray(xy), jnp.asarray(valid),
        jax.random.PRNGKey(1),
    )
    refined = pnp.refine_pnp(
        res, jnp.asarray(pts), jnp.asarray(xy), lambda pc: pc[:2] / pc[2],
    )
    dR = np.asarray(refined.R) @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5
    assert np.linalg.norm(np.asarray(refined.t) - t) < 0.02


def test_ransac_pnp_rejects_garbage(rng):
    n = 100
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    valid = np.ones(n, bool)
    res = pnp.ransac_pnp(
        jnp.asarray(pts), jnp.asarray(xy), jnp.asarray(valid),
        jax.random.PRNGKey(2), min_inliers=30,
    )
    assert not bool(res.ok)


def test_ransac_pnp_respects_valid_mask(rng):
    pts, xy, R, t, _ = _scene(rng, n_out=0)
    valid = np.zeros(len(pts), bool)
    valid[:50] = True
    # corrupt every invalid entry completely
    xy[50:] = rng.uniform(-3, 3, (len(pts) - 50, 2))
    res = pnp.ransac_pnp(
        jnp.asarray(pts), jnp.asarray(xy), jnp.asarray(valid),
        jax.random.PRNGKey(3),
    )
    assert bool(res.ok)
    assert not np.asarray(res.inliers)[~valid].any()
