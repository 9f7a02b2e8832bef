"""Distributed bundle adjustment over a device mesh.

The TPU-native replacement for what the reference cannot do at all:
global BA sharded across chips (SURVEY.md §5.7-5.8 and the BASELINE
north star).  Observations (the dominant axis: |O| >> |K|+|P|) are
sharded over the mesh; every device evaluates residual/Jacobian products
for its shard and the camera/landmark normal-equation accumulations are
reduced with psum over ICI.  Poses and points are replicated (the
camera-system blocks a Schur solver would reduce are exactly these psum
operands); sharding the landmark blocks themselves over the mesh is the
next refinement.

The LM/PCG structure is identical to solver/ba.py — same fixed point —
so single-chip and multi-chip paths are interchangeable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import lie
from ..solver.ba import BAProblem, BAResult, _obs_residual_jac
from ..solver.robust import DELTA_MONO, CHI2_MONO, huber_weight


def optimize_sharded(
    mesh: Mesh,
    p: BAProblem,
    project,
    n_iters: int = 10,
    cg_iters: int = 40,
    use_huber: bool = True,
    axis: str = "shard",
) -> BAResult:
    """LM-PCG bundle adjustment with observations sharded over `mesh`.

    The observation arrays of `p` must have length divisible by the mesh
    size (pad with obs_valid=False).  Returns the same BAResult as the
    single-device solver.
    """
    n_dev = mesh.shape[axis]
    O = p.obs_kf.shape[0]
    assert O % n_dev == 0, (O, n_dev)

    run = _make_run(mesh, project, n_iters, cg_iters, use_huber, axis)

    obs_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    p = BAProblem(
        R=jax.device_put(p.R, rep),
        t=jax.device_put(p.t, rep),
        points=jax.device_put(p.points, rep),
        obs_kf=jax.device_put(p.obs_kf, obs_sharding),
        obs_mp=jax.device_put(p.obs_mp, obs_sharding),
        obs_uv=jax.device_put(p.obs_uv, obs_sharding),
        inv_sigma2=jax.device_put(p.inv_sigma2, obs_sharding),
        obs_valid=jax.device_put(p.obs_valid, obs_sharding),
        fixed_kf=jax.device_put(p.fixed_kf, rep),
        fixed_mp=jax.device_put(p.fixed_mp, rep),
    )

    R, t, points, inliers, cost = run(
        p.R, p.t, p.points, p.obs_kf, p.obs_mp, p.obs_uv, p.inv_sigma2,
        p.obs_valid, p.fixed_kf, p.fixed_mp,
    )
    return BAResult(R=R, t=t, points=points, inliers=inliers, cost=cost)


@functools.lru_cache(maxsize=64)
def _make_run(mesh, project, n_iters, cg_iters, use_huber, axis):
    """Build + jit the sharded LM program ONCE per (mesh, config): a
    bare shard_map call re-traces on every invocation (~18 s of tracing
    per BA call for the scan-of-jacfwd body), so the jitted callable is
    cached here and jit's shape cache handles the rest."""

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),                      # R, t, points
            P(axis), P(axis), P(axis), P(axis), P(axis),  # obs shards
            P(), P(),                            # fixed masks
        ),
        out_specs=(P(), P(), P(), P(axis), P()),
        check_vma=False,
    )
    def run(R, t, points, obs_kf, obs_mp, obs_uv, inv_sigma2, obs_valid,
            fixed_kf, fixed_mp):
        K = R.shape[0]
        Pn = points.shape[0]
        dtype = points.dtype
        free_kf = (~fixed_kf).astype(dtype)[:, None]
        free_mp = (~fixed_mp).astype(dtype)[:, None]
        shard = BAProblem(
            R=R, t=t, points=points, obs_kf=obs_kf, obs_mp=obs_mp,
            obs_uv=obs_uv, inv_sigma2=inv_sigma2, obs_valid=obs_valid,
            fixed_kf=fixed_kf, fixed_mp=fixed_mp,
        )

        def build(R, t, points):
            r, Jp, Jl = _obs_residual_jac(R, t, points, shard, project)
            chi2 = jnp.sum(r * r, -1) * inv_sigma2
            w = huber_weight(chi2, DELTA_MONO) if use_huber else jnp.ones_like(chi2)
            w = w * inv_sigma2 * obs_valid.astype(dtype)
            return r, Jp, Jl, w

        def lm_step(state, _):
            R, t, points, lam = state
            r, Jp, Jl, w = build(R, t, points)
            Jpw = Jp * w[:, None, None]
            Jlw = Jl * w[:, None, None]

            # partial accumulations + psum over the mesh (the ICI ride)
            g_pose = jax.lax.psum(
                jnp.zeros((K, 6), dtype).at[obs_kf].add(
                    jnp.einsum("oif,oi->of", Jpw, r)
                ),
                axis,
            ) * free_kf
            g_point = jax.lax.psum(
                jnp.zeros((Pn, 3), dtype).at[obs_mp].add(
                    jnp.einsum("oif,oi->of", Jlw, r)
                ),
                axis,
            ) * free_mp
            Hpp = jax.lax.psum(
                jnp.zeros((K, 6, 6), dtype).at[obs_kf].add(
                    jnp.einsum("oif,oig->ofg", Jpw, Jp)
                ),
                axis,
            )
            Hll = jax.lax.psum(
                jnp.zeros((Pn, 3, 3), dtype).at[obs_mp].add(
                    jnp.einsum("oif,oig->ofg", Jlw, Jl)
                ),
                axis,
            )
            Mp = jnp.linalg.inv(Hpp + lam * jnp.eye(6, dtype=dtype)[None])
            Ml = jnp.linalg.inv(Hll + lam * jnp.eye(3, dtype=dtype)[None])

            def hv(vp, vl):
                vp = vp * free_kf
                vl = vl * free_mp
                u = jnp.einsum("oif,of->oi", Jp, vp[obs_kf]) + jnp.einsum(
                    "oif,of->oi", Jl, vl[obs_mp]
                )
                uw = u * w[:, None]
                hp = jax.lax.psum(
                    jnp.zeros((K, 6), dtype).at[obs_kf].add(
                        jnp.einsum("oif,oi->of", Jp, uw)
                    ),
                    axis,
                ) * free_kf
                hl = jax.lax.psum(
                    jnp.zeros((Pn, 3), dtype).at[obs_mp].add(
                        jnp.einsum("oif,oi->of", Jl, uw)
                    ),
                    axis,
                ) * free_mp
                return hp + lam * vp, hl + lam * vl

            def precond(vp, vl):
                return (
                    jnp.einsum("kfg,kg->kf", Mp, vp) * free_kf,
                    jnp.einsum("pfg,pg->pf", Ml, vl) * free_mp,
                )

            def dot(a, b):
                return jnp.sum(a[0] * b[0]) + jnp.sum(a[1] * b[1])

            x = (jnp.zeros_like(g_pose), jnp.zeros_like(g_point))
            rr = (g_pose, g_point)
            z = precond(*rr)
            pdir = z
            rz = dot(rr, z)

            def cg_body(carry, _):
                x, rr, pdir, rz = carry
                Ap = hv(*pdir)
                alpha = rz / jnp.maximum(dot(pdir, Ap), 1e-20)
                x = (x[0] + alpha * pdir[0], x[1] + alpha * pdir[1])
                rr = (rr[0] - alpha * Ap[0], rr[1] - alpha * Ap[1])
                z = precond(*rr)
                rz_new = dot(rr, z)
                beta = rz_new / jnp.maximum(rz, 1e-20)
                pdir = (z[0] + beta * pdir[0], z[1] + beta * pdir[1])
                return (x, rr, pdir, rz_new), None

            (x, _, _, _), _ = jax.lax.scan(
                cg_body, (x, rr, pdir, rz), None, length=cg_iters
            )
            dp, dl = -x[0], -x[1]

            dR, dt = jax.vmap(lie.se3_exp)(dp)
            Rn = R @ dR
            tn = jnp.einsum("kij,kj->ki", R, dt) + t
            pn = points + dl

            def cost(Rc, tc, pc):
                r2, _, _ = _obs_residual_jac(Rc, tc, pc, shard, project)
                c2 = jnp.sum(r2 * r2, -1) * inv_sigma2
                if use_huber:
                    d2 = DELTA_MONO * DELTA_MONO
                    rho = jnp.where(
                        c2 <= d2, c2, 2.0 * DELTA_MONO * jnp.sqrt(c2) - d2
                    )
                else:
                    rho = c2
                return jax.lax.psum(
                    jnp.sum(jnp.where(obs_valid, rho, 0.0)), axis
                )

            c_new = cost(Rn, tn, pn)
            c_old = cost(R, t, points)
            better = c_new < c_old
            R = jnp.where(better, Rn, R)
            t = jnp.where(better, tn, t)
            points = jnp.where(better, pn, points)
            lam = jnp.where(better, lam * 0.5, lam * 4.0)
            return (R, t, points, lam), None

        lam0 = jnp.asarray(1e-4, dtype)
        state, _ = jax.lax.scan(
            lm_step, (R, t, points, lam0), None, length=n_iters
        )
        R, t, points, _ = state
        r, _, _ = _obs_residual_jac(R, t, points, shard, project)
        chi2 = jnp.sum(r * r, -1) * inv_sigma2
        inliers = obs_valid & (chi2 <= CHI2_MONO)
        cost = jax.lax.psum(jnp.sum(jnp.where(obs_valid, chi2, 0.0)), axis)
        return R, t, points, inliers, cost

    return run
