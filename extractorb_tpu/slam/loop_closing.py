"""Loop closing: place recognition, Sim3 verification, loop correction.

Replaces LoopClosing (reference: src/LoopClosing.cc:56 Run,
:263 NewDetectCommonRegions, :557 DetectCommonRegionsFromBoW,
:1013 CorrectLoop) as a synchronous per-keyframe stage: BoW candidates
from the keyframe database, mutual-best descriptor matching of
map-point-bearing keypoints, batched Sim3 RANSAC, then a Sim3 pose-graph
optimisation over the essential graph (sequential + covisibility +
loop edges) with map-point correction through their reference keyframes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..frontend import matcher as fm
from ..geometry import sim3 as gsim3
from ..solver import pose_graph as pg
from .map import SLAMMap


# Keyframe-database keys are Atlas-global: (map id, keyframe id) packed
# into one int64 so entries from different maps never collide (keyframe
# ids restart at 0 in each new Atlas map).
_MID_STRIDE = 1 << 32


def encode_dbid(mid: int, kf_id: int) -> int:
    return mid * _MID_STRIDE + kf_id


def decode_dbid(key: int) -> Tuple[int, int]:
    return int(key) // _MID_STRIDE, int(key) % _MID_STRIDE


class LoopCloser:
    def __init__(self, vocab, project, min_score_candidates: int = 3,
                 inv_sigma2=None):
        from ..place.database import KeyFrameDatabase

        self.db = KeyFrameDatabase(vocab, capacity=256) if vocab else None
        self.project = project
        self.inv_sigma2 = inv_sigma2
        self.n_loops = 0
        self.n_merges = 0
        self._rng = np.random.default_rng(7)

    # ------------------------------------------------------------ per-KF

    def process_keyframe(self, mp: SLAMMap, kf_id: int, atlas=None):
        """Detect + correct a loop (same map) or merge (other Atlas map)
        for the new keyframe.  Returns False, True (loop closed), or a
        merge-info dict (truthy) from slam.merge.merge_maps."""
        if self.db is None:
            return False
        mid = mp.mid
        kf = mp.keyframes[kf_id]
        covis = {k for k, _ in mp.covisible_keyframes(kf_id, 1)} | {kf_id}
        cands = self.db.query(
            kf.desc, valid=kf.valid,
            exclude={encode_dbid(mid, k) for k in covis}, n_best=5,
        )
        self.db.add(encode_dbid(mid, kf_id), kf.desc, valid=kf.valid)
        same = [
            (k, s) for key, s in cands
            for m, k in [decode_dbid(key)]
            if m == mid and abs(k - kf_id) > 5
        ]
        cross = [
            (m, k, s) for key, s in cands
            for m, k in [decode_dbid(key)]
            if m != mid
        ]

        if len(mp.keyframes) >= 8:
            for cand_id, _ in same[:3]:
                if cand_id not in mp.keyframes:
                    continue
                if self._verify_and_correct(mp, kf_id, cand_id):
                    self.n_loops += 1
                    return True

        # cross-map candidate -> Atlas map merge (reference
        # NewDetectCommonRegions finding mpMergeMatchedKF in another map,
        # src/LoopClosing.cc:129 -> MergeLocal :1252)
        if atlas is not None:
            for m, k, _ in cross[:3]:
                other = atlas.map_by_mid(m)
                if other is None or k not in other.keyframes:
                    continue
                info = self._verify_and_merge(atlas, mp, kf_id, other, k)
                if info:
                    self.n_merges += 1
                    return info
        return False

    # ------------------------------------------------------ verification

    def _sim3_between(self, mp1_map: SLAMMap, kf1, mp2_map: SLAMMap, kf2):
        """Mutual-best descriptor match between map-point-bearing
        keypoints of two keyframes + batched Sim3 RANSAC (reference
        Sim3Solver consumes matched MapPoints' camera-frame positions).
        Returns (S_R, S_t, S_s, inlier_pairs) with p_cam2 = s R p_cam1 + t,
        or None."""
        m12, _ = fm.mutual_best_match(
            jnp.asarray(kf1.desc), jnp.asarray(kf1.valid & (kf1.kp_mp >= 0)),
            jnp.asarray(kf2.desc), jnp.asarray(kf2.valid & (kf2.kp_mp >= 0)),
        )
        m12 = np.asarray(m12)
        rows = np.where(m12 >= 0)[0]
        if len(rows) < 20:
            return None

        cap = 512
        p1 = np.zeros((cap, 3), np.float32)
        p2 = np.zeros((cap, 3), np.float32)
        uv1 = np.zeros((cap, 2), np.float32)
        uv2 = np.zeros((cap, 2), np.float32)
        valid = np.zeros(cap, bool)
        n = 0
        pair_rows = []
        for i1 in rows:
            i2 = int(m12[i1])
            mp1 = int(kf1.kp_mp[i1])
            mp2 = int(kf2.kp_mp[i2])
            if (mp1 < 0 or mp2 < 0 or not mp1_map.mp_valid[mp1]
                    or not mp2_map.mp_valid[mp2]):
                continue
            if n >= cap:
                break
            p1[n] = kf1.R @ mp1_map.mp_pos[mp1] + kf1.t
            p2[n] = kf2.R @ mp2_map.mp_pos[mp2] + kf2.t
            uv1[n] = kf1.xy_un[i1]
            uv2[n] = kf2.xy_un[i2]
            valid[n] = True
            pair_rows.append((mp1, mp2))
            n += 1
        if n < 20:
            return None

        res = gsim3.solve_sim3_ransac(
            jax.random.PRNGKey(int(self._rng.integers(1 << 30))),
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.asarray(valid), self.project,
        )
        if not bool(res.success):
            return None
        inl = np.asarray(res.inliers)
        pairs = [pr for j, pr in enumerate(pair_rows) if j < len(inl) and inl[j]]
        return np.asarray(res.R12), np.asarray(res.t12), float(res.s12), pairs

    def _verify_and_correct(self, mp: SLAMMap, kf_id: int, cand_id: int) -> bool:
        got = self._sim3_between(
            mp, mp.keyframes[kf_id], mp, mp.keyframes[cand_id]
        )
        if got is None:
            return False
        S_R, S_t, S_s, pairs = got
        self._correct_loop(mp, kf_id, cand_id, S_R, S_t, S_s)
        # fuse duplicate map points among verified inlier pairs
        for mp1, mp2 in pairs:
            if mp1 != mp2:
                self._merge_points(mp, keep=mp2, drop=mp1)
        return True

    # ------------------------------------------------------------- merge

    def _verify_and_merge(
        self, atlas, mp: SLAMMap, kf_id: int, other: SLAMMap, cand_id: int
    ):
        """Weld the active map into `other` (reference MergeLocal,
        src/LoopClosing.cc:1252)."""
        from . import merge as mg

        got = self._sim3_between(
            mp, mp.keyframes[kf_id], other, other.keyframes[cand_id]
        )
        if got is None:
            return None
        S_R, S_t, S_s, pairs = got
        info = mg.merge_maps(
            atlas, drop=mp, keep=other, kf_drop_id=kf_id,
            kf_keep_id=cand_id, S_R=S_R, S_t=S_t, S_s=S_s,
        )
        # re-key this closer's database entries for the welded keyframes
        for old_id, new_id in info["kf_remap"].items():
            self.db.rekey(
                encode_dbid(mp.mid, old_id), encode_dbid(other.mid, new_id)
            )
        # fuse the verified duplicate landmark pairs (drop ids remapped)
        remap = info["mp_remap"]
        for mp1, mp2 in pairs:
            m1 = remap.get(mp1, -1)
            if m1 >= 0 and m1 != mp2:
                self._merge_points(other, keep=mp2, drop=m1)
        # welding bundle adjustment around the seam
        if self.inv_sigma2 is not None:
            mg.weld_bundle_adjustment(
                other, info["kf_cur"], info["kf_matched"],
                self.project, self.inv_sigma2,
            )
        return info

    def _merge_points(self, mp: SLAMMap, keep: int, drop: int):
        """MapPoint::Replace analog: move observations of `drop` to `keep`."""
        if not (mp.mp_valid[keep] and mp.mp_valid[drop]):
            return
        for kf_id, kp in list(mp.obs.get(drop, {}).items()):
            if kf_id in mp.obs.get(keep, {}):
                kf = mp.keyframes[kf_id]
                if kf.kp_mp[kp] == drop:
                    kf.kp_mp[kp] = -1
            else:
                mp.obs[keep][kf_id] = kp
                mp.keyframes[kf_id].kp_mp[kp] = keep
        mp.obs[drop] = {}
        mp.remove_point(drop)
        mp.update_point_stats(keep)

    # -------------------------------------------------------- correction

    def _correct_loop(
        self, mp: SLAMMap, kf_id: int, cand_id: int,
        S_R: np.ndarray, S_t: np.ndarray, S_s: float,
    ):
        """Essential-graph optimisation (reference CorrectLoop ->
        OptimizeEssentialGraph, Optimizer.cc:2303)."""
        kf_ids = sorted(mp.keyframes.keys())
        index = {k: i for i, k in enumerate(kf_ids)}
        K = len(kf_ids)
        Rs = np.stack([mp.keyframes[k].R for k in kf_ids]).astype(np.float32)
        ts = np.stack([mp.keyframes[k].t for k in kf_ids]).astype(np.float32)
        ss = np.ones(K, np.float32)

        edges = []

        def rel(i, j):
            """measurement m_ij = S_j * S_i^-1 from current poses."""
            Ri, ti = mp.keyframes[i].R, mp.keyframes[i].t
            Rj, tj = mp.keyframes[j].R, mp.keyframes[j].t
            Rm = Rj @ Ri.T
            tm = tj - Rm @ ti
            return Rm.astype(np.float32), tm.astype(np.float32), np.float32(1.0)

        # sequential (spanning-tree analog) edges
        for a, b in zip(kf_ids[:-1], kf_ids[1:]):
            Rm, tm, sm = rel(a, b)
            edges.append((index[a], index[b], Rm, tm, sm, 1.0))
        # strong covisibility edges
        seen = set()
        for k in kf_ids:
            for nk, w in mp.covisible_keyframes(k, min_weight=30)[:5]:
                key = (min(k, nk), max(k, nk))
                if key in seen or abs(k - nk) <= 1:
                    continue
                seen.add(key)
                Rm, tm, sm = rel(k, nk)
                edges.append((index[k], index[nk], Rm, tm, sm, 1.0))
        # the loop edge: S_cur = S_meas * S_cand where S_meas maps
        # cand-camera coords into cur-camera coords.  solve gave
        # p2 = S12 p1 with 1=cur, 2=cand; so m(cur->cand) = S12.
        edges.append(
            (index[kf_id], index[cand_id],
             S_R.astype(np.float32), S_t.astype(np.float32), np.float32(S_s),
             8.0)
        )

        E = len(edges)
        prob = pg.PoseGraphProblem(
            R=jnp.asarray(Rs), t=jnp.asarray(ts), s=jnp.asarray(ss),
            edge_i=jnp.asarray(np.array([e[0] for e in edges], np.int32)),
            edge_j=jnp.asarray(np.array([e[1] for e in edges], np.int32)),
            m_R=jnp.asarray(np.stack([e[2] for e in edges])),
            m_t=jnp.asarray(np.stack([e[3] for e in edges])),
            m_s=jnp.asarray(np.array([e[4] for e in edges], np.float32)),
            weight=jnp.asarray(np.array([e[5] for e in edges], np.float32)),
            edge_valid=jnp.ones(E, bool),
            fixed=jnp.asarray(np.array([k == cand_id for k in kf_ids])),
        )
        R_new, t_new, s_new, _ = pg.optimize_pose_graph(prob, n_iters=15)
        R_new = np.asarray(R_new)
        t_new = np.asarray(t_new)
        s_new = np.asarray(s_new)

        # correct map points through their reference keyframe (reference
        # CorrectLoop: p' = S_new^-1 (S_old p))
        by_ref: Dict[int, List[int]] = {}
        for p in np.where(mp.mp_valid[: mp._next_mp])[0]:
            o = mp.obs.get(int(p))
            if not o:
                continue
            ref = int(mp.mp_first_kf[p])
            if ref not in mp.keyframes:
                ref = next(iter(o))
            by_ref.setdefault(ref, []).append(int(p))
        for ref, pts in by_ref.items():
            i = index.get(ref)
            if i is None:
                continue
            R_old, t_old = mp.keyframes[ref].R, mp.keyframes[ref].t
            pts_arr = mp.mp_pos[pts]
            cam = pts_arr @ R_old.T + t_old
            # invert corrected Sim3: x_w = (1/s) R^T (cam - t)
            Rn, tn, sn = R_new[i], t_new[i], float(s_new[i])
            world = ((cam - tn) @ Rn) / sn
            mp.mp_pos[pts] = world

        for k in kf_ids:
            i = index[k]
            # fold scale into translation (SE3 pose with unit scale):
            # x_cam = s R x + t  ->  R' = R, t' = t / s for the SE3 used
            # by tracking (depth rescales consistently with the points)
            mp.keyframes[k].R = R_new[i]
            mp.keyframes[k].t = t_new[i] / s_new[i]
        mp.version += 1
