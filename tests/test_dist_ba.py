"""Distributed BA on the virtual 8-device CPU mesh vs single-device BA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extractorb_tpu.core import lie
from extractorb_tpu.dist import mesh as dmesh
from extractorb_tpu.dist import sharded_ba as dba
from extractorb_tpu.solver import ba as sba

from test_solver import FX, FY, CX, CY, project, make_ba_scene


def build_problem(rng, n_kf=6, n_mp=100):
    Rs, ts, pts, obs = make_ba_scene(rng, n_kf=n_kf, n_mp=n_mp)
    K, P, O = len(Rs), len(pts), len(obs)
    obs_kf = np.array([o[0] for o in obs], np.int32)
    obs_mp = np.array([o[1] for o in obs], np.int32)
    obs_uv = np.array([[o[2], o[3]] for o in obs], np.float32)
    Rs_n = Rs.copy()
    ts_n = ts.copy()
    for k in range(1, K):
        dR, dt = lie.se3_exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.01))
        Rs_n[k] = Rs[k] @ np.asarray(dR)
        ts_n[k] = Rs[k] @ np.asarray(dt) + ts[k]
    pts_n = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05
    # pad O to a multiple of 8 for the mesh
    Opad = ((O + 7) // 8) * 8
    pad = lambda a, fill=0: np.concatenate(
        [a, np.full((Opad - O,) + a.shape[1:], fill, a.dtype)], 0
    )
    fixed_kf = np.zeros(K, bool)
    fixed_kf[0] = True
    prob = sba.BAProblem(
        R=jnp.asarray(Rs_n), t=jnp.asarray(ts_n), points=jnp.asarray(pts_n),
        obs_kf=jnp.asarray(pad(obs_kf)), obs_mp=jnp.asarray(pad(obs_mp)),
        obs_uv=jnp.asarray(pad(obs_uv)),
        inv_sigma2=jnp.asarray(pad(np.ones(O, np.float32), 1.0)),
        obs_valid=jnp.asarray(pad(np.ones(O, bool), False)),
        fixed_kf=jnp.asarray(fixed_kf),
        fixed_mp=jnp.zeros(P, bool),
    )
    return prob, (Rs, ts, pts, obs_kf, obs_mp, obs_uv)


def test_sharded_matches_single(rng):
    assert len(jax.devices()) >= 8, jax.devices()
    prob, truth = build_problem(rng)
    res1 = sba.optimize(prob, project, n_iters=8, cg_iters=40)
    mesh = dmesh.make_mesh(8)
    res8 = dba.optimize_sharded(mesh, prob, project, n_iters=8, cg_iters=40)
    # same fixed point: costs close, poses close
    assert float(res8.cost) <= float(res1.cost) * 1.2 + 1.0
    np.testing.assert_allclose(
        np.asarray(res8.R), np.asarray(res1.R), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(res8.t), np.asarray(res1.t), atol=5e-3
    )


def test_sharded_reduces_error(rng):
    prob, (Rs, ts, pts, obs_kf, obs_mp, obs_uv) = build_problem(rng)
    mesh = dmesh.make_mesh(8)
    res = dba.optimize_sharded(mesh, prob, project, n_iters=10, cg_iters=40)
    R_out, t_out, p_out = map(np.asarray, (res.R, res.t, res.points))

    def rms(R, t, points):
        e = []
        for o in range(len(obs_kf)):
            pc = R[obs_kf[o]] @ points[obs_mp[o]] + t[obs_kf[o]]
            uv = np.array([FX * pc[0] / pc[2] + CX, FY * pc[1] / pc[2] + CY])
            e.append(((uv - obs_uv[o]) ** 2).sum())
        return np.sqrt(np.mean(e))

    assert rms(R_out, t_out, p_out) < 0.6
