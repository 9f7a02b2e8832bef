"""Global bundle adjustment: the engine's GBA path, sharded over the mesh.

Replaces LoopClosing::RunGlobalBundleAdjustment (reference:
src/LoopClosing.cc:2430): after a loop correction (or on demand) the
whole active map is refined.  Where the reference spawns a transient
CPU thread and limits itself to one machine, this builds the full-map
problem once on the host and runs the landmark-sharded Schur LM solver
(dist/sharded_ba.optimize_schur_sharded) over every available device —
points and observations sharded, only the reduced (K,6) camera system
riding the psum.

Also implements the reference's correction PROPAGATION (LoopClosing.cc
:2430+8-66): keyframes that were not part of the BA problem (created
while an async GBA ran, or truncated) are corrected through the
spanning tree (Tchild_corr = Tchild * Tparent^-1 * Tparent_corr) and
non-optimised points through their reference keyframe's correction.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..solver import ba as sba
from . import mesh as dmesh
from .sharded_ba import optimize_schur_sharded


def build_global_problem(
    mp,
    inv_sigma2: Sequence[float],
    n_shards: int,
    fixed_ids: Optional[Set[int]] = None,
):
    """Full-map BAProblem with landmarks partitioned into `n_shards`
    contiguous blocks and each observation stored on its point's shard.

    Returns (problem, kf_ids, pt_ids, obs_kf_np, obs_mp_np) or None if
    the map is too small.  obs_mp indexes points globally in the padded
    point array; padding observations carry obs_valid=False.
    """
    kf_ids = sorted(mp.keyframes.keys())
    if len(kf_ids) < 2:
        return None
    if fixed_ids is None:
        fixed_ids = {kf_ids[0]}
    kf_index = {k: i for i, k in enumerate(kf_ids)}

    pt_ids = mp.points_seen_by(kf_ids)
    if len(pt_ids) < 8:
        return None
    P = len(pt_ids)
    Ps = -(-P // n_shards)          # points per shard
    P_pad = Ps * n_shards

    lookup = np.full(len(mp.mp_valid), -1, np.int32)
    lookup[pt_ids] = np.arange(P, dtype=np.int32)
    inv_s = np.asarray(inv_sigma2, np.float32)

    okf_l, omp_l, ouv_l, osig_l = [], [], [], []
    for ki, kf_id in enumerate(kf_ids):
        kf = mp.keyframes[kf_id]
        rows = np.where(kf.kp_mp >= 0)[0]
        pidx = lookup[kf.kp_mp[rows]]
        keep = pidx >= 0
        rows, pidx = rows[keep], pidx[keep]
        okf_l.append(np.full(len(rows), ki, np.int32))
        omp_l.append(pidx.astype(np.int32))
        ouv_l.append(kf.xy_un[rows])
        osig_l.append(inv_s[np.clip(kf.octave[rows], 0, len(inv_s) - 1)])
    obs_kf = np.concatenate(okf_l)
    obs_mp = np.concatenate(omp_l)
    obs_uv = np.concatenate(ouv_l, 0).astype(np.float32)
    obs_sig = np.concatenate(osig_l)
    if len(obs_kf) < 16:
        return None

    # group observations by their point's shard and pad each group to a
    # common length so the concatenation shards evenly over the mesh
    shard_of = obs_mp // Ps
    order = np.argsort(shard_of, kind="stable")
    obs_kf, obs_mp = obs_kf[order], obs_mp[order]
    obs_uv, obs_sig = obs_uv[order], obs_sig[order]
    shard_of = shard_of[order]
    counts = np.bincount(shard_of, minlength=n_shards)
    Os = int(np.ceil(max(int(counts.max()), 1) / 128) * 128)
    O_pad = Os * n_shards
    okf = np.zeros(O_pad, np.int32)
    omp = np.zeros(O_pad, np.int32)
    ouv = np.zeros((O_pad, 2), np.float32)
    osig = np.ones(O_pad, np.float32)
    oval = np.zeros(O_pad, bool)
    start = 0
    for s in range(n_shards):
        n = int(counts[s])
        dst = s * Os
        okf[dst:dst + n] = obs_kf[start:start + n]
        omp[dst:dst + n] = obs_mp[start:start + n]
        ouv[dst:dst + n] = obs_uv[start:start + n]
        osig[dst:dst + n] = obs_sig[start:start + n]
        oval[dst:dst + n] = True
        # padding observations must address a point on THIS shard so the
        # device-local index stays in range
        omp[dst + n:dst + Os] = s * Ps
        start += n

    K = len(kf_ids)
    Rs = np.stack([mp.keyframes[k].R for k in kf_ids]).astype(np.float32)
    ts = np.stack([mp.keyframes[k].t for k in kf_ids]).astype(np.float32)
    fixed = np.array([k in fixed_ids for k in kf_ids])
    if not fixed.any():
        fixed[0] = True

    pts = np.zeros((P_pad, 3), np.float32)
    pts[:, 2] = 1.0                  # padded points off the camera plane
    pts[:P] = mp.mp_pos[pt_ids]
    fixed_mp = np.ones(P_pad, bool)
    fixed_mp[:P] = False

    prob = sba.BAProblem(
        R=jnp.asarray(Rs), t=jnp.asarray(ts), points=jnp.asarray(pts),
        obs_kf=jnp.asarray(okf), obs_mp=jnp.asarray(omp),
        obs_uv=jnp.asarray(ouv), inv_sigma2=jnp.asarray(osig),
        obs_valid=jnp.asarray(oval),
        fixed_kf=jnp.asarray(fixed), fixed_mp=jnp.asarray(fixed_mp),
    )
    return prob, kf_ids, pt_ids, okf, omp, oval


class PendingGBA:
    """A dispatched-but-unfetched global BA (reference: the transient
    RunGlobalBundleAdjustment thread + mbStopGBA, LoopClosing.cc:1013+231
    and :2430).

    The Schur-sharded solve executes on the device mesh while tracking
    keeps processing frames; ``apply`` fetches the result, writes it
    back, and propagates corrections to keyframes/points created while
    the solve was in flight (the reference's mnBAGlobalForKF spanning-
    tree propagation, LoopClosing.cc:2430+8-66).  A pending GBA whose
    map was superseded (new loop correction, merge, reset) is simply
    dropped — the reference's mbStopGBA kill.
    """

    def __init__(self, res, fixed, kf_ids, pt_ids, obs_kf, obs_mp,
                 obs_valid, old_poses, mid):
        self.res = res
        self.fixed = fixed
        self.kf_ids = kf_ids
        self.pt_ids = pt_ids
        self.obs_kf = obs_kf
        self.obs_mp = obs_mp
        self.obs_valid = obs_valid
        self.old_poses = old_poses
        self.mid = mid

    def is_ready(self) -> bool:
        """True when the device solve has finished (fetching then costs
        only the transfer, not a stall)."""
        try:
            return bool(self.res.R.is_ready())
        except AttributeError:  # pragma: no cover — older jax
            return True

    def apply(self, mp) -> bool:
        """Fetch + write back + outlier erase + propagation.  Returns
        False (and does nothing) if ``mp`` is not the map this solve was
        dispatched for."""
        if mp.mid != self.mid:
            return False
        kf_ids, pt_ids = self.kf_ids, self.pt_ids
        R_all, t_all, pts_out, inl = jax.device_get(
            (self.res.R, self.res.t, self.res.points, self.res.inliers)
        )
        for i, k in enumerate(kf_ids):
            if not self.fixed[i] and k in mp.keyframes:
                mp.keyframes[k].R = np.asarray(R_all[i])
                mp.keyframes[k].t = np.asarray(t_all[i])
        live = mp.mp_valid[pt_ids]
        mp.mp_pos[pt_ids[live]] = np.asarray(pts_out)[: len(pt_ids)][live]

        # outlier observation erase (reference post-BA loop,
        # Optimizer.cc:2190 region)
        inl = np.asarray(inl)
        bad = np.where(self.obs_valid & ~inl)[0]
        for o in bad:
            p = int(pt_ids[self.obs_mp[o]]) \
                if self.obs_mp[o] < len(pt_ids) else -1
            if p >= 0 and mp.mp_valid[p] \
                    and kf_ids[self.obs_kf[o]] in mp.keyframes:
                mp.erase_observation(p, kf_ids[self.obs_kf[o]])

        propagate_corrections(
            mp, self.old_poses, set(kf_ids), set(pt_ids.tolist())
        )
        mp.version += 1
        return True


def dispatch_global_ba(
    mp,
    project,
    inv_sigma2: Sequence[float],
    n_iters: int = 10,
    mesh=None,
    fixed_ids: Optional[Set[int]] = None,
) -> Optional[PendingGBA]:
    """Build + dispatch the sharded full-map BA without blocking.

    Uses every available device by default (a 1-device mesh degenerates
    to the single-chip Schur path).  Returns a PendingGBA handle (the
    solve runs asynchronously on device), or None if the map is too
    small for a BA.
    """
    if mesh is None:
        mesh = dmesh.make_mesh()
    n_dev = int(np.prod(list(mesh.shape.values())))

    built = build_global_problem(mp, inv_sigma2, n_dev, fixed_ids)
    if built is None:
        return None
    prob, kf_ids, pt_ids, obs_kf, obs_mp, obs_valid = built

    # snapshot for propagation to anything outside the problem (and to
    # keyframes created between dispatch and apply)
    old_poses = {k: (mp.keyframes[k].R.copy(), mp.keyframes[k].t.copy())
                 for k in kf_ids}

    res = optimize_schur_sharded(mesh, prob, project, n_iters=n_iters)
    return PendingGBA(
        res=res, fixed=np.asarray(jax.device_get(prob.fixed_kf)),
        kf_ids=kf_ids, pt_ids=pt_ids, obs_kf=obs_kf, obs_mp=obs_mp,
        obs_valid=obs_valid, old_poses=old_poses, mid=mp.mid,
    )


def run_global_ba(
    mp,
    project,
    inv_sigma2: Sequence[float],
    n_iters: int = 10,
    mesh=None,
    fixed_ids: Optional[Set[int]] = None,
) -> bool:
    """Synchronous sharded full-map BA: dispatch + apply in one call.
    Returns True when a BA ran."""
    pending = dispatch_global_ba(
        mp, project, inv_sigma2, n_iters=n_iters, mesh=mesh,
        fixed_ids=fixed_ids,
    )
    if pending is None:
        return False
    return pending.apply(mp)


def propagate_corrections(
    mp,
    old_poses: Dict[int, Tuple[np.ndarray, np.ndarray]],
    optimized_kfs: Set[int],
    optimized_pts: Set[int],
):
    """Reference LoopClosing.cc:2430+8-66: spanning-tree propagation.

    Keyframes outside the BA inherit their parent's correction through
    the relative pose (Tchild_corr = Tchild_old * Tparent_old^-1 *
    Tparent_corr); points outside the BA are re-expressed through their
    reference keyframe's correction.
    """
    # breadth-first from optimised keyframes down the spanning tree
    pending = [k for k in sorted(mp.keyframes.keys())
               if k not in optimized_kfs]
    # old poses must include pre-correction parents
    for k in pending:
        kf = mp.keyframes[k]
        old_poses.setdefault(k, (kf.R.copy(), kf.t.copy()))

    corrected: Set[int] = set(optimized_kfs)
    changed = True
    while changed and pending:
        changed = False
        still = []
        for k in pending:
            kf = mp.keyframes[k]
            par = kf.parent
            if par in corrected and par in mp.keyframes:
                Rp_old, tp_old = old_poses.get(
                    par, (mp.keyframes[par].R, mp.keyframes[par].t)
                )
                Rc_old, tc_old = old_poses[k]
                # T_child_parent = Tc_old * Tp_old^-1
                R_cp = Rc_old @ Rp_old.T
                t_cp = tc_old - R_cp @ tp_old
                pkf = mp.keyframes[par]
                kf.R = (R_cp @ pkf.R).astype(np.float32)
                kf.t = (R_cp @ pkf.t + t_cp).astype(np.float32)
                corrected.add(k)
                changed = True
            else:
                still.append(k)
        pending = still

    # points outside the BA: correct via their reference keyframe
    n = mp._next_mp
    for p in np.where(mp.mp_valid[:n])[0]:
        p = int(p)
        if p in optimized_pts:
            continue
        ref = int(mp.mp_first_kf[p])
        if ref not in mp.keyframes or ref not in old_poses:
            o = mp.obs.get(p, {})
            ref = next((k for k in o if k in old_poses), -1)
            if ref < 0:
                continue
        R_old, t_old = old_poses[ref]
        kf = mp.keyframes[ref]
        pc = R_old @ mp.mp_pos[p] + t_old
        mp.mp_pos[p] = (kf.R.T @ (pc - kf.t)).astype(np.float32)
