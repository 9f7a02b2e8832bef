"""Local mapping: per-keyframe map growth and refinement.

Replaces LocalMapping (reference: src/LocalMapping.cc:67-276 Run loop,
:341 MapPointCulling, :383 CreateNewMapPoints, :935 KeyFrameCulling) and
the window BA (src/Optimizer.cc:1694 LocalBundleAdjustment).

Runs synchronously after keyframe insertion with a bounded iteration
budget (the TPU replacement for the mbAbortBA/SetAcceptKeyFrames thread
interplay, SURVEY.md §2.7): every step costs a fixed number of jit
calls, so mapping latency is bounded by construction.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Set

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import matcher as fm
from ..geometry import two_view as tv
from ..solver import ba as sba
from .map import INVALID, SLAMMap


def run_ba(
    mp: SLAMMap,
    kf_ids: Sequence[int],
    fixed_ids: Set[int],
    project,
    inv_sigma2: Sequence[float],
    n_iters: int = 10,
    max_points: int = 8192,
    max_obs: int = 32768,
):
    """Build a BAProblem from a keyframe window and write results back.

    kf_ids: optimised + fixed keyframes (fixed ones listed in fixed_ids).
    Points: all points observed by the non-fixed keyframes.  Outlier
    observations (chi2 > 5.991 after optimisation) are erased from the
    map like the reference's post-BA loop (Optimizer.cc:2190 region).
    """
    kf_ids = [k for k in kf_ids if k in mp.keyframes]
    if len(kf_ids) < 2:
        return
    kf_index = {k: i for i, k in enumerate(kf_ids)}
    opt_ids = [k for k in kf_ids if k not in fixed_ids]

    pt_ids = mp.points_seen_by(opt_ids)[:max_points]
    if len(pt_ids) < 8:
        return

    # vectorized observation gather: iterate keyframes (few dozen), not
    # observations (up to 10^5 python dict hits for a global BA)
    lookup = np.full(len(mp.mp_valid), -1, np.int32)
    lookup[pt_ids] = np.arange(len(pt_ids), dtype=np.int32)
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
    obs_kf = np.concatenate(okf_l) if okf_l else np.zeros(0, np.int32)
    obs_mp = np.concatenate(omp_l) if omp_l else np.zeros(0, np.int32)
    obs_uv = (
        np.concatenate(ouv_l, 0) if ouv_l else np.zeros((0, 2), np.float32)
    )
    obs_sig = np.concatenate(osig_l) if osig_l else np.zeros(0, np.float32)
    if len(obs_kf) < 16:
        return
    O = min(len(obs_kf), max_obs)

    K = len(kf_ids)
    P = len(pt_ids)
    Rs = np.stack([mp.keyframes[k].R for k in kf_ids]).astype(np.float32)
    ts = np.stack([mp.keyframes[k].t for k in kf_ids]).astype(np.float32)
    fixed = np.array([k in fixed_ids for k in kf_ids])
    if not fixed.any():
        fixed[0] = True  # gauge

    # Coarse bucket ladders so jit shapes repeat across calls: the
    # round-1 fine-grained buckets (K/8, P/1024, O/4096) produced a new
    # XLA program almost every keyframe — ~3 s of recompilation each on
    # the TPU backend, dominating full-SLAM wall-clock.
    def bucket(n, ladder):
        for b in ladder:
            if n <= b:
                return b
        return int(np.ceil(n / ladder[-1]) * ladder[-1])

    Kp = bucket(K, (32, 64, 128, 256))
    Pp = bucket(P, (2048, 8192, 32768))
    Op = bucket(O, (8192, 32768, 131072))
    Rs_p = np.tile(np.eye(3, dtype=np.float32), (Kp, 1, 1))
    ts_p = np.zeros((Kp, 3), np.float32)
    Rs_p[:K], ts_p[:K] = Rs, ts
    fixed_p = np.ones(Kp, bool)
    fixed_p[:K] = fixed
    pts_p = np.zeros((Pp, 3), np.float32)
    pts_p[:P] = mp.mp_pos[pt_ids]
    pts_p[P:, 2] = 1.0  # keep padded points off the camera plane
    fixed_mp_p = np.ones(Pp, bool)
    fixed_mp_p[:P] = False
    okf = np.zeros(Op, np.int32)
    omp = np.zeros(Op, np.int32)
    ouv = np.zeros((Op, 2), np.float32)
    osig = np.ones(Op, np.float32)
    oval = np.zeros(Op, bool)
    okf[:O] = obs_kf[:O]
    omp[:O] = obs_mp[:O]
    ouv[:O] = obs_uv[:O]
    osig[:O] = obs_sig[:O]
    oval[:O] = True

    prob = sba.BAProblem(
        R=jnp.asarray(Rs_p), t=jnp.asarray(ts_p),
        points=jnp.asarray(pts_p),
        obs_kf=jnp.asarray(okf),
        obs_mp=jnp.asarray(omp),
        obs_uv=jnp.asarray(ouv),
        inv_sigma2=jnp.asarray(osig),
        obs_valid=jnp.asarray(oval),
        fixed_kf=jnp.asarray(fixed_p),
        fixed_mp=jnp.asarray(fixed_mp_p),
    )
    res = sba.optimize(prob, project, n_iters=n_iters, cg_iters=40)

    R_all, t_all, pts_out, inl = jax.device_get(
        (res.R, res.t, res.points, res.inliers)
    )
    R_out = np.asarray(R_all)[:K]
    t_out = np.asarray(t_all)[:K]
    for k, i in kf_index.items():
        if not fixed[i]:
            mp.keyframes[k].R = R_out[i]
            mp.keyframes[k].t = t_out[i]
    mp.mp_pos[pt_ids] = np.asarray(pts_out)[:P]

    inl = np.asarray(inl)
    for o in np.where(~inl[:O])[0]:
        p = int(pt_ids[obs_mp[o]])
        kf_id = kf_ids[obs_kf[o]]
        mp.erase_observation(p, kf_id)
    mp.version += 1


class LocalMapper:
    def __init__(self, project, scale_factors, inv_sigma2, K,
                 imu_calib=None):
        self.project = project
        self.scale_factors = scale_factors
        self.inv_sigma2 = inv_sigma2
        self.K = K
        self.imu_calib = imu_calib
        self.recent_points: List[int] = []
        # called with (map, kf_id) after a keyframe is culled; the
        # tracker wires this to KeyFrameDatabase.erase (reference
        # KeyFrame::SetBadFlag -> KeyFrameDatabase::erase,
        # src/KeyFrameDatabase.cc:47)
        self.on_kf_removed = None

    # ----------------------------------------------------------- pipeline

    def process_keyframe(self, mp: SLAMMap, kf_id: int):
        """ProcessNewKeyFrame + culling + CreateNewMapPoints +
        SearchInNeighbors fuse + local BA + KeyFrameCulling
        (reference LocalMapping::Run body, :78-230)."""
        self._assign_parent(mp, kf_id)
        self._cull_map_points(mp)
        self._create_new_points(mp, kf_id)
        self._fuse_neighbors(mp, kf_id)
        self._local_ba(mp, kf_id)
        self._cull_keyframes(mp, kf_id)

    def _assign_parent(self, mp: SLAMMap, kf_id: int):
        """Spanning-tree parent: the strongest earlier covisible at
        insertion (reference KeyFrame::UpdateConnections first-connection
        branch, src/KeyFrame.cc ChangeParent region)."""
        kf = mp.keyframes.get(kf_id)
        if kf is None or kf.parent >= 0:
            return
        for nk, _ in mp.covisible_keyframes(kf_id, 1):
            if nk < kf_id:
                kf.parent = nk
                return

    def _cull_map_points(self, mp: SLAMMap):
        """MapPointCulling (reference :341): drop points with found/visible
        ratio < 0.25 or too few observations soon after creation."""
        still = []
        for p in self.recent_points:
            if not mp.mp_valid[p]:
                continue
            vis = max(int(mp.mp_visible[p]), 1)
            ratio = mp.mp_found[p] / vis
            n_obs = mp.n_observations(p)
            age = mp.mp_visible[p]
            if ratio < 0.25 and vis >= 3:
                mp.remove_point(p)
            elif vis >= 4 and n_obs <= 2:
                mp.remove_point(p)
            elif vis >= 6:
                pass  # survived probation
            else:
                still.append(p)
        self.recent_points = still

    def _create_new_points(self, mp: SLAMMap, kf_id: int, n_neighbors: int = 10):
        """CreateNewMapPoints (reference :383): epipolar-gated matching
        with covisible neighbours + triangulation."""
        kf1 = mp.keyframes[kf_id]
        neighbors = [k for k, _ in mp.covisible_keyframes(kf_id, 1)[:n_neighbors]]
        O1 = kf1.center()
        free1 = kf1.valid & (kf1.kp_mp < 0)
        for nk in neighbors:
            kf2 = mp.keyframes[nk]
            baseline = np.linalg.norm(kf2.center() - O1)
            med_depth = self._median_depth(mp, kf2)
            if med_depth <= 0 or baseline / med_depth < 0.01:
                continue
            F12 = self._fundamental(kf1, kf2)
            free2 = kf2.valid & (kf2.kp_mp < 0)
            m12 = np.asarray(
                fm.search_for_triangulation(
                    kf1.feats.desc, jnp.asarray(kf1.xy_un), kf1.feats.octave,
                    jnp.asarray(free1),
                    kf2.feats.desc, jnp.asarray(kf2.xy_un), kf2.feats.octave,
                    jnp.asarray(free2),
                    jnp.asarray(F12.astype(np.float32)),
                    jnp.asarray(
                        np.asarray(
                            [1.0 / s for s in self.inv_sigma2], np.float32
                        )
                    ),
                )
            )
            rows = np.where(m12 >= 0)[0]
            if len(rows) == 0:
                continue
            self._triangulate_pairs(mp, kf1, kf2, rows, m12[rows])
            free1 = kf1.valid & (kf1.kp_mp < 0)

    def _median_depth(self, mp: SLAMMap, kf) -> float:
        ids = kf.kp_mp[kf.kp_mp >= 0]
        ids = ids[mp.mp_valid[ids]] if len(ids) else ids
        if len(ids) == 0:
            return -1.0
        pc = mp.mp_pos[ids] @ kf.R.T + kf.t
        return float(np.median(pc[:, 2]))

    def _fundamental(self, kf1, kf2) -> np.ndarray:
        """ComputeF12 (reference LocalMapping.cc:1032 region)."""
        R12 = kf1.R @ kf2.R.T
        t12 = -R12 @ kf2.t + kf1.t
        tx = np.array(
            [
                [0, -t12[2], t12[1]],
                [t12[2], 0, -t12[0]],
                [-t12[1], t12[0], 0],
            ],
            np.float32,
        )
        Kinv = np.linalg.inv(self.K)
        return Kinv.T @ tx @ R12 @ Kinv

    def _triangulate_pairs(self, mp: SLAMMap, kf1, kf2, idx1, idx2):
        """Triangulate matched pairs with the reference's checks
        (parallax, cheirality, reprojection, scale consistency)."""
        P1 = self.K @ np.concatenate([kf1.R, kf1.t[:, None]], 1)
        P2 = self.K @ np.concatenate([kf2.R, kf2.t[:, None]], 1)
        x1 = kf1.xy_un[idx1]
        x2 = kf2.xy_un[idx2]
        X = np.asarray(
            tv.triangulate(
                jnp.asarray(P1.astype(np.float32)),
                jnp.asarray(P2.astype(np.float32)),
                jnp.asarray(x1), jnp.asarray(x2),
            )
        )
        O1, O2 = kf1.center(), kf2.center()
        r1 = X - O1
        r2 = X - O2
        n1 = np.linalg.norm(r1, axis=-1)
        n2 = np.linalg.norm(r2, axis=-1)
        cos_par = (r1 * r2).sum(-1) / np.maximum(n1 * n2, 1e-12)

        pc1 = X @ kf1.R.T + kf1.t
        pc2 = X @ kf2.R.T + kf2.t
        ok = (pc1[:, 2] > 0) & (pc2[:, 2] > 0) & (cos_par < 0.9998)

        fx, fy, cx, cy = self.K[0, 0], self.K[1, 1], self.K[0, 2], self.K[1, 2]
        for im, (pc, x, kf, idx) in enumerate(
            [(pc1, x1, kf1, idx1), (pc2, x2, kf2, idx2)]
        ):
            u = fx * pc[:, 0] / np.maximum(pc[:, 2], 1e-9) + cx
            v = fy * pc[:, 1] / np.maximum(pc[:, 2], 1e-9) + cy
            sig2 = np.asarray([1.0 / s for s in self.inv_sigma2])[
                np.clip(kf.octave[idx], 0, len(self.inv_sigma2) - 1)
            ]
            err = (u - x[:, 0]) ** 2 + (v - x[:, 1]) ** 2
            ok &= err <= 5.991 * sig2

        # scale consistency (reference :383+300 region)
        sf = np.asarray(self.scale_factors)
        ratio_dist = n2 / np.maximum(n1, 1e-12)
        ratio_oct = (
            sf[np.clip(kf1.octave[idx1], 0, len(sf) - 1)]
            / sf[np.clip(kf2.octave[idx2], 0, len(sf) - 1)]
        )
        factor = 1.5 * float(sf[1])
        ok &= (ratio_dist < ratio_oct * factor) & (
            ratio_dist * factor > ratio_oct
        )

        for j in np.where(ok)[0]:
            i1, i2 = int(idx1[j]), int(idx2[j])
            if kf1.kp_mp[i1] >= 0 or kf2.kp_mp[i2] >= 0:
                continue
            mid = mp.add_point(
                X[j], kf1.desc[i1], np.zeros(3, np.float32), 1.0, kf1.kid
            )
            mp.add_observation(mid, kf1.kid, i1)
            mp.add_observation(mid, kf2.kid, i2)
            mp.update_point_stats(mid)
            self.recent_points.append(mid)

    def _fuse_neighbors(self, mp: SLAMMap, kf_id: int, n_neighbors: int = 10):
        """SearchInNeighbors (reference LocalMapping.cc:729): project the
        covisible neighbours' map points into the new keyframe and attach
        or merge; then the symmetric pass."""
        kf1 = mp.keyframes[kf_id]
        neighbors = [k for k, _ in mp.covisible_keyframes(kf_id, 1)[:n_neighbors]]
        if not neighbors:
            return
        # pass 1: neighbours' points -> kf1
        pts = mp.points_seen_by(neighbors)
        self._fuse_into(mp, kf_id, pts)
        # pass 2: kf1's points -> each neighbour
        own = mp.points_seen_by([kf_id])
        for nk in neighbors:
            self._fuse_into(mp, nk, own)

    def _fuse_into(self, mp: SLAMMap, kf_id: int, pt_ids: np.ndarray):
        kf = mp.keyframes[kf_id]
        # drop points already observed by this keyframe
        pt_ids = np.asarray(
            [p for p in pt_ids if kf_id not in mp.obs.get(int(p), {})],
            np.int32,
        )
        if len(pt_ids) == 0:
            return
        M = 4096
        pt_ids = pt_ids[:M]
        k = len(pt_ids)
        mp_pos = np.zeros((M, 3), np.float32)
        mp_desc = np.zeros((M, 32), np.uint8)
        mp_norm = np.zeros((M, 3), np.float32)
        mp_maxd = np.ones((M,), np.float32)
        mp_val = np.zeros((M,), bool)
        mp_pos[:k] = mp.mp_pos[pt_ids]
        mp_desc[:k] = mp.mp_desc[pt_ids]
        mp_norm[:k] = mp.mp_normal[pt_ids]
        mp_maxd[:k] = mp.mp_max_dist[pt_ids]
        mp_val[:k] = mp.mp_valid[pt_ids]

        img_wh = (1e9, 1e9)  # frustum bound handled by projection checks
        matches = np.asarray(
            fm.search_by_projection_local_map(
                jnp.asarray(mp_pos), jnp.asarray(mp_desc), jnp.asarray(mp_val),
                jnp.asarray(mp_norm), jnp.asarray(mp_maxd),
                jnp.asarray(kf.R), jnp.asarray(kf.t),
                jnp.asarray(kf.xy_un), kf.feats.desc, kf.feats.octave,
                jnp.asarray(kf.valid), None,
                self.project, self.scale_factors, img_wh,
                0.75,  # reference Fuse radius 3.0*scale (vs 4.0 base here)
            )
        )
        for row in np.where(matches >= 0)[0]:
            p = int(pt_ids[row])
            kp = int(matches[row])
            existing = int(kf.kp_mp[kp])
            if existing >= 0 and mp.mp_valid[existing]:
                # merge: keep the point with more observations
                if mp.n_observations(existing) >= mp.n_observations(p):
                    keep, drop = existing, p
                else:
                    keep, drop = p, existing
                if keep == drop:
                    continue
                for okf, okp in list(mp.obs.get(drop, {}).items()):
                    if okf not in mp.obs.get(keep, {}):
                        mp.obs[keep][okf] = okp
                        mp.keyframes[okf].kp_mp[okp] = keep
                    else:
                        if mp.keyframes[okf].kp_mp[okp] == drop:
                            mp.keyframes[okf].kp_mp[okp] = -1
                mp.obs[drop] = {}
                mp.remove_point(drop)
                mp.update_point_stats(keep)
            else:
                mp.add_observation(p, kf_id, kp)
                mp.update_point_stats(p)

    def _cull_keyframes(self, mp: SLAMMap, kf_id: int):
        """KeyFrameCulling (reference :935): a covisible keyframe is
        redundant if >=90% of its map points are observed by >=3 other
        keyframes at the same or finer scale."""
        for cand, _ in mp.covisible_keyframes(kf_id, 1):
            kf = mp.keyframes.get(cand)
            if kf is None or cand <= 1:  # keep the initial pair
                continue
            kp_rows = np.where(kf.kp_mp >= 0)[0]
            if len(kp_rows) < 10:
                continue
            ids = kf.kp_mp[kp_rows]
            ok = mp.mp_valid[ids]
            kp_rows, ids = kp_rows[ok], ids[ok]
            n_pts = len(ids)
            if n_pts == 0:
                continue
            lvls = kf.octave[kp_rows].astype(np.int32)
            lookup = np.full(len(mp.mp_valid), -1, np.int32)
            lookup[ids] = np.arange(n_pts, dtype=np.int32)
            n_better = np.zeros(n_pts, np.int32)
            for okf_id, okf in mp.keyframes.items():
                if okf_id == cand:
                    continue
                orows = np.where(okf.kp_mp >= 0)[0]
                pidx = lookup[okf.kp_mp[orows]]
                keep = pidx >= 0
                orows, pidx = orows[keep], pidx[keep]
                fine = okf.octave[orows] <= lvls[pidx] + 1
                np.add.at(n_better, pidx[fine], 1)
            n_redundant = int((n_better >= 3).sum())
            if n_redundant > 0.9 * n_pts:
                self._remove_keyframe(mp, cand)

    def _remove_keyframe(self, mp: SLAMMap, kf_id: int):
        """SetBadFlag analog: detach all observations and drop the KF."""
        kf = mp.keyframes.get(kf_id)
        if kf is None:
            return
        for kp in np.where(kf.kp_mp >= 0)[0]:
            p = int(kf.kp_mp[kp])
            if p in mp.obs and kf_id in mp.obs[p]:
                mp.erase_observation(p, kf_id)
        # inertial temporal-chain repair (reference KeyFrame::SetBadFlag
        # + Preintegrated::MergePrevious, src/ImuTypes.cc:312): the
        # successor inherits prev_kf and the merged measurement window
        succ = next(
            (k for k in mp.keyframes.values() if k.prev_kf == kf_id), None
        )
        if succ is not None:
            succ.prev_kf = kf.prev_kf
            if self.imu_calib is not None and (
                kf.imu_meas is not None or succ.imu_meas is not None
            ):
                from . import imu_frontend

                succ.imu_meas = imu_frontend.merge_measurements(
                    kf.imu_meas, succ.imu_meas
                )
                bias = (
                    np.concatenate([succ.bg, succ.ba]).astype(np.float32)
                    if succ.bg is not None
                    else np.zeros(6, np.float32)
                )
                if succ.imu_meas is not None:
                    succ.preint = imu_frontend.integrate_raw(
                        succ.imu_meas, bias, self.imu_calib
                    )
        # spanning-tree surgery: reparent children to this KF's parent
        # (simplified vs the reference's best-covisible-candidate search
        # in KeyFrame::SetBadFlag — the parent is always a valid
        # covisible ancestor, which preserves tree connectivity)
        for other in mp.keyframes.values():
            if other.parent == kf_id:
                other.parent = kf.parent
        kf.is_bad = True
        # tombstone for trajectory resolution (reference SetBadFlag's
        # mTcp = Tcw * parent.Twc)
        parent = mp.keyframes.get(kf.parent)
        if parent is not None:
            R_cp = (kf.R @ parent.R.T).astype(np.float32)
            t_cp = (kf.t - R_cp @ parent.t).astype(np.float32)
            mp.dead_kfs[kf_id] = (kf.parent, R_cp, t_cp)
        del mp.keyframes[kf_id]
        mp.version += 1
        if self.on_kf_removed is not None:
            self.on_kf_removed(mp, kf_id)

    def _local_ba(self, mp: SLAMMap, kf_id: int):
        """LocalBundleAdjustment window build (reference Optimizer.cc:1698):
        local = covisibles of the new KF; fixed = other KFs observing the
        local points.  Inertial maps with an initialised IMU run
        LocalInertialBA over the temporal window instead (the reference's
        mbInertial branch, src/LocalMapping.cc:149-154)."""
        if self.imu_calib is not None and mp.imu_initialized:
            from . import imu_frontend

            if imu_frontend.local_inertial_ba(
                mp, self.imu_calib, self.project, kf_id,
                n_window=10,
            ):
                return
        local = [kf_id] + [k for k, _ in mp.covisible_keyframes(kf_id, 1)]
        local_set = set(local)
        pt_ids = mp.points_seen_by(local)
        fixed: Set[int] = set()
        for p in pt_ids:
            for k in mp.obs.get(int(p), {}):
                if k not in local_set:
                    fixed.add(k)
        all_ids = local + sorted(fixed)
        # keep the problem bounded (reference uses the covisibility window)
        all_ids = all_ids[:24]
        if len(local) >= len(all_ids):
            fixed_ids = {all_ids[-1]} if len(all_ids) > 2 else set()
        else:
            fixed_ids = set(all_ids) - set(local)
        run_ba(
            mp, all_ids, fixed_ids, self.project, self.inv_sigma2, n_iters=8
        )
