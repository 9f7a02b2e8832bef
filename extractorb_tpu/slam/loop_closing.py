"""Loop closing: place recognition, Sim3 verification, loop correction.

Replaces LoopClosing (reference: src/LoopClosing.cc:56 Run,
:263 NewDetectCommonRegions, :502 DetectAndReffineSim3FromLastKF,
:557 DetectCommonRegionsFromBoW, :958 FindMatchesByProjection,
:1013 CorrectLoop) as a synchronous per-keyframe stage with the
reference's full verification cascade:

  BoW candidates -> covisible-window SearchByBoW (>=20 distinct MPs)
  -> Sim3 RANSAC (>=15 inliers) -> guided projection (>=50)
  -> OptimizeSim3 LM refine (>=20 inliers) -> re-projection with the
  optimised Sim3 (>=80) -> spatial consistency over the current KF's
  covisibles (>=3 of them re-find >=30 projections) -> else temporal
  consistency accumulated over subsequent keyframes (3 hits).

Correction follows CorrectLoop: propagate the corrected Sim3 through the
current covisible window, replace matched duplicates, SearchAndFuse the
loop cloud into the window, optimise the essential graph (spanning tree
+ covisibility(>=100) + loop edges + new loop connections), then a
bounded full-map bundle adjustment (the GBA analog).
"""

from __future__ import annotations

import dataclasses
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


@dataclasses.dataclass(frozen=True)
class LoopThresholds:
    """Reference acceptance constants (LoopClosing.cc:557-565, :510-512).

    Scaled-down variants are handy for small synthetic test maps; the
    defaults are the reference's values for real sequences."""

    min_kfs: int = 12                 # :291 map-size gate
    n_bow_matches: int = 20           # nBoWMatches
    n_bow_inliers: int = 15           # nBoWInliers (Sim3 RANSAC)
    n_sim3_inliers: int = 20          # nSim3Inliers (OptimizeSim3)
    n_proj_matches: int = 50          # nProjMatches (coarse Sim3)
    n_proj_opt_matches: int = 80      # nProjOptMatches (refined Sim3)
    n_covis_consistency: int = 3      # spatial/temporal coincidences
    n_proj_refine: int = 30           # DetectAndReffine nProjMatches
    n_proj_opt_refine: int = 50       # DetectAndReffine nProjOptMatches
    n_proj_rep: int = 100             # DetectAndReffine nProjMatchesRep


@dataclasses.dataclass
class _Pending:
    """Temporal-consistency hypothesis (reference mnLoopNumCoincidences /
    mg2oLoopSlw / mpLoopLastCurrentKF state, LoopClosing.cc:302-360)."""

    mid: int
    matched_kf: int
    last_cur_kf: int
    Scw: Tuple[np.ndarray, np.ndarray, float]   # world -> last cur cam
    cloud: np.ndarray                            # loop map-point ids
    n_coincidences: int
    n_not_found: int = 0
    matched_pairs: Optional[List[Tuple[int, int]]] = None  # (cur kp, mp)


def _sim3_compose(Ra, ta, sa, Rb, tb, sb):
    """(Ra,ta,sa) o (Rb,tb,sb): x -> sa Ra (sb Rb x + tb) + ta."""
    return Ra @ Rb, sa * (Ra @ tb) + ta, sa * sb


class LoopCloser:
    def __init__(self, vocab, project, scale_factors=None, img_wh=None,
                 inv_sigma2=None, thresholds: Optional[LoopThresholds] = None,
                 fix_scale: bool = False, imu_calib=None,
                 async_gba: bool = True):
        from ..place.database import KeyFrameDatabase

        self.db = KeyFrameDatabase(vocab, capacity=256) if vocab else None
        self.vocab = vocab
        self.project = project
        self.scale_factors = tuple(scale_factors or
                                   tuple(1.2 ** i for i in range(8)))
        self.img_wh = tuple(img_wh or (640, 480))
        self.inv_sigma2 = inv_sigma2
        self.fix_scale = fix_scale
        self.imu_calib = imu_calib
        self.th = thresholds or LoopThresholds()
        self.n_loops = 0
        self.n_merges = 0
        # Concurrent GBA (reference: transient RunGlobalBundleAdjustment
        # thread + mbStopGBA, LoopClosing.cc:1013+231): the post-loop
        # full-map solve is dispatched to the device mesh and applied on
        # a LATER keyframe event (or finish()), so the camera feed never
        # stalls for the solve.  False = apply inline (deterministic
        # tests / offline refinement).
        self.async_gba = async_gba
        self.pending_gba = None
        self.n_gba_applied = 0
        # in-flight welding BA after an Atlas merge (same dispatch-then-
        # confirm pattern as the GBA: the solve runs on device while
        # tracking resumes in the already-welded, Sim3-consistent map)
        self.pending_weld = None   # (mid, PendingBA)
        # essential graphs with at least this many edges run the
        # edge-sharded multi-device solver (dist/sharded_pose_graph);
        # smaller graphs stay single-device (identical fixed point,
        # cheaper dispatch)
        self.sharded_graph_min_edges = 256
        self._rng = np.random.default_rng(7)
        self._pending: Optional[_Pending] = None
        self._words: Dict[Tuple[int, int], np.ndarray] = {}

    # ------------------------------------------------------- pending GBA

    def poll_gba(self, mp: SLAMMap, force: bool = False):
        """Apply a finished in-flight GBA (reference: the GBA thread's
        write-back section runs when the solve ends; here the host
        checks at each keyframe event).  With force=True, block until
        the device solve completes (flush semantics)."""
        p = self.pending_gba
        if p is None:
            return
        if p.mid != mp.mid:
            # the map this solve belonged to was dropped or welded away
            self.pending_gba = None
            return
        if force or p.is_ready():
            self.pending_gba = None
            if p.apply(mp):
                self.n_gba_applied += 1

    def poll_weld(self, mp: SLAMMap, force: bool = False):
        """Apply a finished in-flight post-merge welding BA."""
        w = self.pending_weld
        if w is None:
            return
        mid, pend = w
        if mid != mp.mid:
            self.pending_weld = None
            return
        try:
            ready = pend.res.R.is_ready()
        except AttributeError:  # pragma: no cover — older jax
            ready = True
        if force or ready:
            self.pending_weld = None
            pend.apply(mp)

    def finish(self, mp: SLAMMap):
        """Settle any in-flight GBA / welding BA (Tracker.flush)."""
        self.poll_gba(mp, force=True)
        self.poll_weld(mp, force=True)

    # ------------------------------------------------------------ per-KF

    def process_keyframe(self, mp: SLAMMap, kf_id: int, atlas=None):
        """Detect + correct a loop (same map) or merge (other Atlas map)
        for the new keyframe.  Returns False, True (loop closed), or a
        merge-info dict (truthy) from slam.merge.merge_maps."""
        if self.db is None:
            return False
        self.poll_gba(mp)
        self.poll_weld(mp)
        mid = mp.mid
        kf = mp.keyframes[kf_id]
        # "connected" = the weight>=15 covisibility graph (reference
        # KeyFrame::UpdateConnections threshold; KeyFrameDatabase
        # excludes GetConnectedKeyFrames() from candidacy) — a weight-1
        # exclusion would block every keyframe that shares a single
        # point with the query, which on contiguous maps is all of them
        covis = {k for k, _ in mp.covisible_keyframes(kf_id, 15)} | {kf_id}

        def covis_keys(key, _atlas=atlas, _mp=mp):
            """Covisibility group of a stored entry, as database keys
            (reference DetectNBestCandidates accumulates scores over
            GetBestCovisibilityKeyFrames(10))."""
            m, k = decode_dbid(key)
            target = _mp if m == _mp.mid else (
                _atlas.map_by_mid(m) if _atlas is not None else None
            )
            if target is None or k not in target.keyframes:
                return []
            return [encode_dbid(m, nk)
                    for nk, _ in target.covisible_keyframes(k, 1)[:10]]

        # score floor (reference DetectLoopCandidates minScore,
        # KeyFrameDatabase.cc:100): a candidate must look at least as
        # similar as the query's WORST-scoring covisible neighbour
        min_score = self.db.min_score_against(
            [encode_dbid(mid, k) for k in covis if k != kf_id],
            kf.desc, valid=kf.valid,
        )
        cands = self.db.query(
            kf.desc, valid=kf.valid,
            exclude={encode_dbid(mid, k) for k in covis}, n_best=3,
            covis_fn=covis_keys, min_score=min_score,
        )
        self.db.add(encode_dbid(mid, kf_id), kf.desc, valid=kf.valid)

        # map-size gate (reference :291).  Deviation: it only guards
        # same-map LOOP detection here — a fresh post-loss recovery map
        # should weld back into the Atlas as soon as place recognition
        # fires, not after accumulating 12 keyframes.
        same_map_enabled = len(mp.keyframes) >= self.th.min_kfs

        # 1. temporal-consistency continuation (reference :302-360):
        # re-verify the pending hypothesis from the new keyframe first.
        if same_map_enabled and self._pending is not None \
                and self._pending.mid == mid:
            if self._refine_pending(mp, kf_id):
                if self._pending.n_coincidences >= self.th.n_covis_consistency:
                    p = self._pending
                    self._pending = None
                    self._do_correct(mp, kf_id, p.matched_kf, p.Scw,
                                     p.matched_pairs or [], p.cloud)
                    self.n_loops += 1
                    return True
                # hypothesis re-verified but not yet 3 hits: wait for the
                # next keyframe (reference bLoopDetectedInKF skips the
                # fresh BoW detection, LoopClosing.cc:360)
                return False
            elif self._pending is not None:
                # (_refine_pending clears _pending itself when the
                # hypothesis keyframes were culled from the map)
                self._pending.n_not_found += 1
                if self._pending.n_not_found >= 2:
                    self._pending = None

        same = [
            (k, s) for key, s in cands
            for m, k in [decode_dbid(key)]
            if m == mid and k in mp.keyframes
        ]
        cross = [
            (m, k, s) for key, s in cands
            for m, k in [decode_dbid(key)]
            if m != mid
        ]

        # 2. fresh BoW detection over the candidates
        for cand_id, _ in same if same_map_enabled else []:
            got = self._detect_from_bow(mp, kf_id, cand_id)
            if got is None:
                continue
            Scw, pairs, cloud, n_spatial = got
            if n_spatial + 1 >= self.th.n_covis_consistency:
                self._pending = None
                self._do_correct(mp, kf_id, cand_id, Scw, pairs, cloud)
                self.n_loops += 1
                return True
            # not enough spatial support yet: remember and wait for the
            # next keyframes to confirm (reference nNumCoincidences)
            self._pending = _Pending(
                mid=mid, matched_kf=cand_id, last_cur_kf=kf_id,
                Scw=Scw, cloud=cloud, n_coincidences=n_spatial + 1,
                matched_pairs=pairs,
            )
            break

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

    # ----------------------------------------------------- word caching

    def _kf_words(self, mp: SLAMMap, kf_id: int) -> np.ndarray:
        key = (mp.mid, kf_id)
        w = self._words.get(key)
        if w is None:
            kf = mp.keyframes[kf_id]
            w = np.asarray(self.vocab.transform_words(kf.desc))
            w = np.where(kf.valid, w, -1).astype(np.int32)
            self._words[key] = w
        return w

    # -------------------------------------------------- projection match

    def _window_cloud(self, mp: SLAMMap, kf_id: int,
                      exclude_connected_to: Optional[int] = None) -> np.ndarray:
        """Loop map-point cloud: matched KF + 5 best covisibles + up to 5
        covisibles-of-each (reference FindMatchesByProjection :958-984)."""
        window = [kf_id]
        cov = [k for k, _ in mp.covisible_keyframes(kf_id, 1)[:5]]
        window += cov
        seen = set(window)
        cur_cov: Set[int] = set()
        if exclude_connected_to is not None:
            cur_cov = {k for k, _ in
                       mp.covisible_keyframes(exclude_connected_to, 1)}
        for c in cov:
            n_ins = 0
            for k2, _ in mp.covisible_keyframes(c, 1):
                if k2 in seen or k2 in cur_cov:
                    continue
                seen.add(k2)
                window.append(k2)
                n_ins += 1
                if n_ins >= 5:
                    break
        return mp.points_seen_by(window)

    def _project_matches(self, mp: SLAMMap, cur_kf, cloud: np.ndarray,
                         Scw, th: float) -> List[Tuple[int, int]]:
        """SearchByProjection through Scw into cur_kf (reference
        ORBmatcher.cc:473): returns (cur kp index, cloud mp id) pairs
        with one keypoint claimed at most once (first MP wins)."""
        if len(cloud) == 0:
            return []
        R, t, s = Scw
        best_kp = np.asarray(fm.search_by_projection_sim3(
            jnp.asarray(mp.mp_pos[cloud]), jnp.asarray(mp.mp_desc[cloud]),
            jnp.asarray(mp.mp_valid[cloud]), jnp.asarray(mp.mp_normal[cloud]),
            jnp.asarray(mp.mp_max_dist[cloud]),
            jnp.float32(s), jnp.asarray(R.astype(np.float32)),
            jnp.asarray(t.astype(np.float32)),
            jnp.asarray(cur_kf.xy_un), jnp.asarray(cur_kf.desc),
            jnp.asarray(cur_kf.octave), jnp.asarray(cur_kf.valid),
            self.project, self.scale_factors, self.img_wh, float(th),
        ))
        pairs: List[Tuple[int, int]] = []
        claimed: Set[int] = set()
        for row, kp in enumerate(best_kp):
            if kp < 0 or int(kp) in claimed:
                continue
            claimed.add(int(kp))
            pairs.append((int(kp), int(cloud[row])))
        return pairs

    def _search_by_sim3_mutual(self, mp: SLAMMap, cur, cand, Scw, Scm):
        """SearchBySim3 (reference ORBmatcher.cc:1735): bidirectional
        projection between the two keyframes through the Sim3 hypothesis
        — cand's map points into cur AND cur's map points into cand —
        keeping only mutually consistent keypoint pairs.  Returns
        (cur kp, cand mp id) pairs."""
        cloud2 = mp.points_seen_by([cand.kid])
        cloud1 = mp.points_seen_by([cur.kid])
        if len(cloud1) == 0 or len(cloud2) == 0:
            return []
        pairs_a = self._project_matches(mp, cur, cloud2, Scw, th=7.5)
        # hypothesis-consistent world->cand Sim3: S_mc o T_cw
        S_mc = lie.sim3_inverse(
            jnp.asarray(Scm[0]), jnp.asarray(Scm[1]), jnp.float32(Scm[2])
        )
        S_mw = _sim3_compose(
            np.asarray(S_mc[0]), np.asarray(S_mc[1]), float(S_mc[2]),
            cur.R.astype(np.float32), cur.t.astype(np.float32), 1.0,
        )
        pairs_b = self._project_matches(mp, cand, cloud1, S_mw, th=7.5)
        b = {kp2: pid1 for kp2, pid1 in pairs_b}
        mutual = []
        for kp1, pid2 in pairs_a:
            kp2 = mp.obs.get(pid2, {}).get(cand.kid)
            if kp2 is None or kp2 not in b:
                continue
            pid1 = b[kp2]
            if mp.obs.get(pid1, {}).get(cur.kid) == kp1:
                mutual.append((kp1, pid2))
        return mutual

    # ------------------------------------------------------ verification

    def _detect_from_bow(self, mp: SLAMMap, kf_id: int, cand_id: int):
        """DetectCommonRegionsFromBoW for one candidate (reference
        :557-868).  Returns (Scw, matched_pairs, cloud, n_spatial) or
        None."""
        th_ = self.th
        cur = mp.keyframes[kf_id]
        cur_words = self._kf_words(mp, kf_id)
        connected = {k for k, _ in mp.covisible_keyframes(kf_id, 15)}

        # candidate window = the candidate's top connected keyframes on
        # the weight>=15 graph (reference GetBestCovisibilityKeyFrames;
        # a weight-1 window would sweep in the whole map and trip
        # bAbortByNearKF on every genuine revisit)
        cov_kfs = [cand_id] + [
            k for k, _ in mp.covisible_keyframes(cand_id, 15)[:5]
        ]
        if any(k in connected for k in cov_kfs):
            return None  # bAbortByNearKF

        # covisible-window SearchByBoW: union of distinct matched MPs,
        # indexed by the CURRENT keyframe's keypoint
        matched_mp = np.full(len(cur.valid), -1, np.int64)
        seen_mps: Set[int] = set()
        for ck in cov_kfs:
            ckf = mp.keyframes.get(ck)
            if ckf is None:
                continue
            cw = self._kf_words(mp, ck)
            m = np.asarray(fm.search_by_bow(
                jnp.asarray(cur.desc), jnp.asarray(cur_words),
                jnp.asarray(cur.angle), jnp.asarray(cur.valid),
                jnp.asarray(ckf.desc), jnp.asarray(cw),
                jnp.asarray(ckf.angle),
                jnp.asarray(ckf.valid & (ckf.kp_mp >= 0)),
                0.9,
            ))
            for i in np.where(m >= 0)[0]:
                p = int(ckf.kp_mp[m[i]])
                if p < 0 or not mp.mp_valid[p] or p in seen_mps:
                    continue
                seen_mps.add(p)
                if matched_mp[i] < 0:
                    matched_mp[i] = p
        if len(seen_mps) < th_.n_bow_matches:
            return None

        # Sim3 RANSAC on (current MP, matched MP) pairs in camera coords
        rows = [
            i for i in np.where(matched_mp >= 0)[0]
            if cur.kp_mp[i] >= 0 and mp.mp_valid[cur.kp_mp[i]]
        ]
        if len(rows) < th_.n_bow_inliers:
            return None
        cand = mp.keyframes[cand_id]
        cap = 512
        p1 = np.zeros((cap, 3), np.float32)
        p2 = np.zeros((cap, 3), np.float32)
        uv1 = np.zeros((cap, 2), np.float32)
        uv2 = np.zeros((cap, 2), np.float32)
        val = np.zeros(cap, bool)
        for n, i in enumerate(rows[:cap]):
            mpi = int(cur.kp_mp[i])
            mpj = int(matched_mp[i])
            p1[n] = cur.R @ mp.mp_pos[mpi] + cur.t
            p2[n] = cand.R @ mp.mp_pos[mpj] + cand.t
            uv1[n] = cur.xy_un[i]
            # measurement in the matched KF: its own keypoint if this MP
            # is observed there, else the projection (bAllPoints analog)
            kp2 = mp.obs.get(mpj, {}).get(cand_id)
            if kp2 is not None:
                uv2[n] = cand.xy_un[kp2]
            else:
                uv2[n] = np.asarray(self.project(jnp.asarray(p2[n])))
            val[n] = p1[n, 2] > 0 and p2[n, 2] > 0
        res = gsim3.solve_sim3_ransac(
            jax.random.PRNGKey(int(self._rng.integers(1 << 30))),
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.asarray(val), self.project,
            self.fix_scale,
        )
        if int(np.sum(np.asarray(res.inliers))) < th_.n_bow_inliers:
            return None
        # RANSAC gives Smc (cur cam -> cand cam); we need Scm
        R_mc, t_mc, s_mc = (np.asarray(res.R12), np.asarray(res.t12),
                            float(res.s12))
        Ri, ti, si = lie.sim3_inverse(
            jnp.asarray(R_mc), jnp.asarray(t_mc), jnp.float32(s_mc)
        )
        Scm = (np.asarray(Ri), np.asarray(ti), float(si))
        Smw = (cand.R.astype(np.float32), cand.t.astype(np.float32), 1.0)
        Scw = _sim3_compose(*Scm, *Smw)

        # loop cloud + guided projection with the coarse Sim3 (th=8)
        cloud = self._window_cloud(mp, cand_id, exclude_connected_to=kf_id)
        pairs = self._project_matches(mp, cur, cloud, Scw, th=8.0)
        if len(pairs) < th_.n_proj_matches:
            return None

        # SearchBySim3 mutual KF<->KF expansion (reference
        # ORBmatcher.cc:1735, ComputeSim3 flow): bidirectionally
        # consistent pairs between the two keyframes raise the match
        # recall going into the Sim3 refine
        have = {kp for kp, _ in pairs}
        for kp, pid in self._search_by_sim3_mutual(mp, cur, cand, Scw, Scm):
            if kp not in have:
                have.add(kp)
                pairs.append((kp, pid))

        # OptimizeSim3 refine on the projected matches
        Scm_opt = self._optimize_scm(mp, cur, cand, pairs, Scm)
        if Scm_opt is None:
            return None
        Scm, n_opt = Scm_opt
        if n_opt < th_.n_sim3_inliers:
            return None
        Scw = _sim3_compose(*Scm, *Smw)

        # re-projection with the optimised Sim3 (th=5)
        pairs = self._project_matches(mp, cur, cloud, Scw, th=5.0)
        if len(pairs) < th_.n_proj_opt_matches:
            return None

        # spatial consistency: the current KF's covisibles must also
        # re-find the cloud through their propagated Sim3 (>=30 each)
        n_spatial = 0
        for j, _ in mp.covisible_keyframes(kf_id, 1)[:5]:
            if n_spatial >= th_.n_covis_consistency:
                break
            kfj = mp.keyframes[j]
            Tjc_R = kfj.R @ cur.R.T
            Tjc_t = kfj.t - Tjc_R @ cur.t
            Sjw = _sim3_compose(Tjc_R.astype(np.float32),
                                Tjc_t.astype(np.float32), 1.0, *Scw)
            pj = self._project_matches(mp, kfj, cloud, Sjw, th=4.5)
            if len(pj) >= th_.n_proj_refine:
                n_spatial += 1
        return Scw, pairs, cloud, n_spatial

    def _optimize_scm(self, mp: SLAMMap, cur, cand, pairs, Scm):
        """OptimizeSim3 wrapper: build (p1, p2, obs1, obs2) arrays from
        (cur kp, loop mp) pairs.  p1 uses the current KF's own MP when
        available, else the loop MP mapped through the current Scm."""
        cap = 1024
        p1 = np.zeros((cap, 3), np.float32)
        p2 = np.zeros((cap, 3), np.float32)
        uv1 = np.zeros((cap, 2), np.float32)
        uv2 = np.zeros((cap, 2), np.float32)
        val = np.zeros(cap, bool)
        R_cm, t_cm, s_cm = Scm
        for n, (kp, pid) in enumerate(pairs[:cap]):
            pw = mp.mp_pos[pid]
            p2c = cand.R @ pw + cand.t
            own = int(cur.kp_mp[kp])
            if own >= 0 and mp.mp_valid[own]:
                p1c = cur.R @ mp.mp_pos[own] + cur.t
            else:
                p1c = s_cm * (R_cm @ p2c) + t_cm
            p1[n] = p1c
            p2[n] = p2c
            uv1[n] = cur.xy_un[kp]
            kp2 = mp.obs.get(pid, {}).get(cand.kid)
            if kp2 is not None:
                uv2[n] = cand.xy_un[kp2]
            else:
                uv2[n] = np.asarray(self.project(jnp.asarray(p2c)))
            val[n] = p2c[2] > 0
        res = gsim3.optimize_sim3(
            jnp.asarray(R_cm.astype(np.float32)),
            jnp.asarray(t_cm.astype(np.float32)), jnp.float32(s_cm),
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.asarray(val), self.project,
            self.fix_scale,
        )
        n_in = int(res.n_in)
        if n_in == 0:
            return None
        return (np.asarray(res.R12), np.asarray(res.t12),
                float(res.s12)), n_in

    def _refine_pending(self, mp: SLAMMap, kf_id: int) -> bool:
        """DetectAndReffineSim3FromLastKF (reference :502): propagate the
        pending Scw to the new keyframe and re-verify by projection +
        OptimizeSim3 + re-projection."""
        th_ = self.th
        p = self._pending
        cur = mp.keyframes[kf_id]
        last = mp.keyframes.get(p.last_cur_kf)
        if last is None or p.matched_kf not in mp.keyframes:
            self._pending = None
            return False
        # Scl = T_cur * T_last^-1 (SE3), Scw_guess = Scl o Scw_prev
        R_cl = cur.R @ last.R.T
        t_cl = cur.t - R_cl @ last.t
        Scw = _sim3_compose(R_cl.astype(np.float32),
                            t_cl.astype(np.float32), 1.0, *p.Scw)

        pairs = self._project_matches(mp, cur, p.cloud, Scw, th=8.0)
        if len(pairs) < th_.n_proj_refine:
            return False
        cand = mp.keyframes[p.matched_kf]
        # Scm = Scw o Swm
        Smw = (cand.R.astype(np.float32), cand.t.astype(np.float32), 1.0)
        Ri, ti, si = lie.sim3_inverse(
            jnp.asarray(Smw[0]), jnp.asarray(Smw[1]), jnp.float32(1.0)
        )
        Scm = _sim3_compose(*Scw, np.asarray(Ri), np.asarray(ti), float(si))
        got = self._optimize_scm(mp, cur, cand, pairs, Scm)
        if got is None:
            return False
        Scm, n_opt = got
        if n_opt <= th_.n_proj_opt_refine:
            return False
        Scw = _sim3_compose(*Scm, *Smw)
        pairs = self._project_matches(mp, cur, p.cloud, Scw, th=5.0)
        if len(pairs) < th_.n_proj_rep:
            return False
        self._pending = _Pending(
            mid=p.mid, matched_kf=p.matched_kf, last_cur_kf=kf_id,
            Scw=Scw, cloud=p.cloud,
            n_coincidences=p.n_coincidences + 1,
            matched_pairs=pairs,
        )
        return True

    # ------------------------------------------------------------- merge

    def _sim3_between(self, mp1_map: SLAMMap, kf1, mp2_map: SLAMMap, kf2):
        """Mutual-best descriptor match between map-point-bearing
        keypoints of two keyframes + batched Sim3 RANSAC (used for the
        cross-map merge path).  Returns (S_R, S_t, S_s, inlier_pairs)
        with p_cam2 = s R p_cam1 + t, or None."""
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
        # welding bundle adjustment around the seam; inertial welds also
        # run the VI window BA (MergeInertialBA, Optimizer.cc:6760).
        # In async mode the solve is dispatched here and applied on a
        # later keyframe event (or finish()) — the merged map is already
        # Sim3-consistent, so tracking resumes immediately and the weld
        # refinement lands without stalling the camera feed.
        if self.inv_sigma2 is not None:
            pend = mg.weld_bundle_adjustment(
                other, info["kf_cur"], info["kf_matched"],
                self.project, self.inv_sigma2,
                async_apply=self.async_gba,
            )
            if pend is not None:
                self.pending_weld = (other.mid, pend)
        if self.imu_calib is not None and other.imu_initialized:
            mg.weld_inertial_bundle_adjustment(
                other, self.imu_calib, self.project, info["kf_cur"],
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

    def _do_correct(self, mp: SLAMMap, kf_id: int, cand_id: int, Scw,
                    matched_pairs, cloud):
        """CorrectLoop (reference :1013): window Sim3 propagation, loop
        fusion, SearchAndFuse, essential graph, bounded GBA."""
        cur = mp.keyframes[kf_id]

        # 1. corrected Sim3 for the current covisible window
        window = [k for k, _ in mp.covisible_keyframes(kf_id, 1)] + [kf_id]
        Twc_R = cur.R.T
        Twc_t = -cur.R.T @ cur.t
        corrected: Dict[int, Tuple[np.ndarray, np.ndarray, float]] = {}
        non_corrected: Dict[int, Tuple[np.ndarray, np.ndarray, float]] = {}
        for k in window:
            kf = mp.keyframes[k]
            non_corrected[k] = (kf.R.copy(), kf.t.copy(), 1.0)
            if k == kf_id:
                corrected[k] = Scw
            else:
                Tic_R = kf.R @ Twc_R
                Tic_t = kf.R @ Twc_t + kf.t
                corrected[k] = _sim3_compose(
                    Tic_R.astype(np.float32), Tic_t.astype(np.float32), 1.0,
                    *Scw,
                )

        # 2. correct window map points: p' = S_corr^-1 (S_old p)
        done: Set[int] = set()
        for k in window:
            kf = mp.keyframes[k]
            R_o, t_o, _ = non_corrected[k]
            R_c, t_c, s_c = corrected[k]
            pts = [int(p) for p in kf.kp_mp if p >= 0 and p not in done
                   and mp.mp_valid[p]]
            if not pts:
                continue
            done.update(pts)
            cam = mp.mp_pos[pts] @ R_o.T + t_o
            world = ((cam - t_c) @ R_c) / s_c
            mp.mp_pos[pts] = world
        # 3. set window poses (scale folded into translation)
        for k in window:
            R_c, t_c, s_c = corrected[k]
            mp.keyframes[k].R = R_c
            mp.keyframes[k].t = t_c / s_c

        # 4. loop fusion: replace the current KF's matched duplicates
        for kp, loop_mp in matched_pairs:
            if not mp.mp_valid[loop_mp]:
                continue
            own = int(cur.kp_mp[kp])
            if own >= 0 and mp.mp_valid[own] and own != loop_mp:
                self._merge_points(mp, keep=loop_mp, drop=own)
            elif own < 0:
                cur.kp_mp[kp] = loop_mp
                mp.add_observation(loop_mp, kf_id, kp)

        # 5. SearchAndFuse the loop cloud into every corrected-window KF
        cloud = np.asarray([p for p in cloud if mp.mp_valid[p]], np.int64)
        for k in window:
            kf = mp.keyframes[k]
            pairs_k = self._project_matches(
                mp, kf, cloud, (kf.R, kf.t, 1.0), th=4.0
            )
            for kp, loop_mp in pairs_k:
                own = int(kf.kp_mp[kp])
                if own >= 0 and mp.mp_valid[own] and own != loop_mp:
                    self._merge_points(mp, keep=loop_mp, drop=own)
                elif own < 0 and mp.mp_valid[loop_mp]:
                    kf.kp_mp[kp] = loop_mp
                    mp.add_observation(loop_mp, k, kp)

        # 6. essential-graph optimisation + point correction.  Edge
        # measurements must come from the PRE-correction poses
        # (NonCorrectedSim3 in the reference, Optimizer.cc:2303):
        # measuring boundary edges with the already-corrected window
        # poses would bake the loop discontinuity into the measurement
        # and the graph would not distribute the drift.
        self._optimize_essential_graph(mp, kf_id, cand_id, window,
                                       non_corrected)

        # 7. record the loop edge for future pose graphs
        mp.keyframes[kf_id].loop_edges.append(cand_id)
        mp.keyframes[cand_id].loop_edges.append(kf_id)

        # 8. full-map GBA (reference RunGlobalBundleAdjustment,
        # LoopClosing.cc:2430).  Visual maps run the landmark-sharded
        # Schur BA over every available device (dist/global_ba.py) — no
        # size gate: problem capacity scales with the mesh.  Inertial
        # maps run FullInertialBA like the reference (:2430+8 branch).
        # In async mode the solve is DISPATCHED here and applied on a
        # later keyframe event (reference: transient GBA thread); a
        # still-in-flight previous solve is superseded and dropped
        # (reference mbStopGBA kill, LoopClosing.cc:1013+7-24).
        self._run_gba(mp)
        mp.version += 1

    def _run_gba(self, mp: SLAMMap):
        if self.imu_calib is not None and mp.imu_initialized:
            from . import imu_frontend
            from ..dist import mesh as dmesh

            # inertial post-loop GBA shards its visual residuals over
            # the mesh too (dist/sharded_ba.optimize_vi_sharded); the
            # O(K) chain is replicated (reference FullInertialBA,
            # Optimizer.cc:420)
            imu_frontend.full_inertial_ba(
                mp, self.imu_calib, self.project, n_iters=7,
                mesh=dmesh.make_mesh(),
            )
            return
        from ..dist import global_ba

        self.pending_gba = None  # superseded by this fresh correction
        pending = global_ba.dispatch_global_ba(
            mp, self.project,
            self.inv_sigma2 if self.inv_sigma2 is not None else [1.0] * 8,
            n_iters=10,
        )
        if pending is None:
            return
        if self.async_gba:
            self.pending_gba = pending
        else:
            if pending.apply(mp):
                self.n_gba_applied += 1

    def _optimize_essential_graph(self, mp: SLAMMap, kf_id: int,
                                  cand_id: int, window: List[int],
                                  non_corrected=None):
        """OptimizeEssentialGraph (reference Optimizer.cc:2303): nodes =
        all keyframes, edges = spanning tree + loop edges + strong
        covisibility (>=100) + the new loop connection; matched loop KF
        fixed.  `non_corrected` maps window keyframes to their
        pre-correction (R, t, s) used for edge measurements."""
        non_corrected = non_corrected or {}
        kf_ids = sorted(mp.keyframes.keys())
        index = {k: i for i, k in enumerate(kf_ids)}
        K = len(kf_ids)
        Rs = np.stack([mp.keyframes[k].R for k in kf_ids]).astype(np.float32)
        ts = np.stack([mp.keyframes[k].t for k in kf_ids]).astype(np.float32)
        ss = np.ones(K, np.float32)

        edges = []
        seen = set()

        def pose_meas(i):
            got = non_corrected.get(i)
            if got is not None:
                return got[0], got[1]
            kf = mp.keyframes[i]
            return kf.R, kf.t

        def rel(i, j, w=1.0):
            key = (min(i, j), max(i, j))
            if key in seen or i == j:
                return
            seen.add(key)
            Ri, ti = pose_meas(i)
            Rj, tj = pose_meas(j)
            Rm = (Rj @ Ri.T).astype(np.float32)
            tm = (tj - Rm @ ti).astype(np.float32)
            edges.append((index[i], index[j], Rm, tm, np.float32(1.0), w))

        # spanning tree (parent edges); falls back to the sequential
        # chain for keyframes without a parent assignment
        for k in kf_ids:
            par = getattr(mp.keyframes[k], "parent", -1)
            if par in mp.keyframes:
                rel(k, par)
        for a, b in zip(kf_ids[:-1], kf_ids[1:]):
            if (min(a, b), max(a, b)) not in seen and \
                    getattr(mp.keyframes[b], "parent", -1) not in mp.keyframes:
                rel(a, b)
        # accumulated loop edges
        for k in kf_ids:
            for le in getattr(mp.keyframes[k], "loop_edges", []):
                if le in mp.keyframes:
                    rel(k, le)
        # strong covisibility edges (reference minFeat=100)
        for k in kf_ids:
            for nk, w in mp.covisible_keyframes(k, min_weight=100)[:8]:
                rel(k, nk)
        # the new loop connection, strongly weighted like the reference's
        # always-included current<->matched edge
        key = (min(kf_id, cand_id), max(kf_id, cand_id))
        if key not in seen:
            seen.add(key)
            i, j = kf_id, cand_id
            Ri, ti = mp.keyframes[i].R, mp.keyframes[i].t
            Rj, tj = mp.keyframes[j].R, mp.keyframes[j].t
            Rm = (Rj @ Ri.T).astype(np.float32)
            tm = (tj - Rm @ ti).astype(np.float32)
            edges.append((index[i], index[j], Rm, tm, np.float32(1.0), 8.0))

        E = len(edges)
        if E == 0:
            return
        # Inertial maps: gravity direction is observable, so the graph
        # must not roll/pitch/rescale the world — route through the
        # 4-DoF (yaw + translation) essential graph like the reference
        # (Optimizer.cc:8153 OptimizeEssentialGraph4DoF, called at
        # LoopClosing.cc:1013+206-211 when the map is inertial).
        if self.imu_calib is not None and mp.imu_initialized:
            prob4 = pg.PoseGraph4DoFProblem(
                R=jnp.asarray(Rs), t=jnp.asarray(ts),
                edge_i=jnp.asarray(np.array([e[0] for e in edges], np.int32)),
                edge_j=jnp.asarray(np.array([e[1] for e in edges], np.int32)),
                m_R=jnp.asarray(np.stack([e[2] for e in edges])),
                m_t=jnp.asarray(np.stack([e[3] for e in edges])),
                weight=jnp.asarray(np.array([e[5] for e in edges],
                                            np.float32)),
                edge_valid=jnp.ones(E, bool),
                fixed=jnp.asarray(np.array([k == cand_id for k in kf_ids])),
            )
            R4, t4 = pg.optimize_pose_graph_4dof(prob4, n_iters=15)[:2]
            R_new = np.asarray(R4)
            t_new = np.asarray(t4)
            s_new = np.ones(K, np.float32)
            self._apply_graph_result(mp, kf_ids, index, R_new, t_new, s_new)
            return
        # Large graphs shard their edge axis over the device mesh
        # (dist/sharded_pose_graph: per-edge residual/Jacobian build on
        # each device, psum-reduced GN system — SURVEY §5.7's scale
        # story for the essential graph, which grows with trajectory
        # length, reference Optimizer.cc:2303 over ALL keyframes).
        # Small graphs stay on one device: the fixed point is identical
        # and the dispatch is cheaper.
        import jax as _jax

        n_dev = len(_jax.devices())
        use_sharded = (E >= self.sharded_graph_min_edges and n_dev > 1)
        E_pad = -(-E // n_dev) * n_dev if use_sharded else E
        ei = np.zeros(E_pad, np.int32)
        ej = np.zeros(E_pad, np.int32)
        mRs = np.tile(np.eye(3, dtype=np.float32), (E_pad, 1, 1))
        mts = np.zeros((E_pad, 3), np.float32)
        mss = np.ones(E_pad, np.float32)
        ws = np.zeros(E_pad, np.float32)
        ev = np.zeros(E_pad, bool)
        ei[:E] = [e[0] for e in edges]
        ej[:E] = [e[1] for e in edges]
        mRs[:E] = np.stack([e[2] for e in edges])
        mts[:E] = np.stack([e[3] for e in edges])
        mss[:E] = [e[4] for e in edges]
        ws[:E] = [e[5] for e in edges]
        ev[:E] = True
        prob = pg.PoseGraphProblem(
            R=jnp.asarray(Rs), t=jnp.asarray(ts), s=jnp.asarray(ss),
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            m_R=jnp.asarray(mRs), m_t=jnp.asarray(mts),
            m_s=jnp.asarray(mss), weight=jnp.asarray(ws),
            edge_valid=jnp.asarray(ev),
            fixed=jnp.asarray(np.array([k == cand_id for k in kf_ids])),
        )
        # stereo/RGBD: scale is observable -> 6-DoF fixed-scale graph
        # (reference OptimizeEssentialGraph bFixScale, Optimizer.cc:2621)
        if use_sharded:
            from ..dist import mesh as dmesh
            from ..dist import sharded_pose_graph as dpg

            R_new, t_new, s_new, _ = dpg.optimize_sharded_pose_graph(
                dmesh.make_mesh(), prob, n_iters=15,
                fix_scale=self.fix_scale,
            )
        else:
            R_new, t_new, s_new, _ = pg.optimize_pose_graph(
                prob, n_iters=15, fix_scale=self.fix_scale
            )
        self._apply_graph_result(
            mp, kf_ids, index,
            np.asarray(R_new), np.asarray(t_new), np.asarray(s_new),
        )

    def _apply_graph_result(self, mp: SLAMMap, kf_ids, index,
                            R_new, t_new, s_new):
        """Write back optimised graph poses and correct map points
        through their reference keyframe (reference Optimizer.cc:2303
        tail: p' = S_new^-1 (S_old p))."""
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
            Rn, tn, sn = R_new[i], t_new[i], float(s_new[i])
            world = ((cam - tn) @ Rn) / sn
            mp.mp_pos[pts] = world

        for k in kf_ids:
            i = index[k]
            # fold scale into translation (SE3 pose with unit scale)
            mp.keyframes[k].R = R_new[i]
            mp.keyframes[k].t = t_new[i] / s_new[i]
        mp.version += 1
