"""Atlas map merging (reference LoopClosing::MergeLocal,
src/LoopClosing.cc:1252 and MergeBundleAdjustmentVisual,
src/Optimizer.cc:5759).

When place recognition matches the current keyframe against a keyframe
of a *different* Atlas map, the active (newer, drifting) map is welded
into the matched (older) map: every keyframe pose and map point of the
active map is transformed by the verified camera-to-camera Sim3 lifted
to a world-to-world Sim3, appended into the kept map with id remapping,
duplicate landmarks are fused, and a welding bundle adjustment runs over
the covisible window around the seam with the rest of the kept map held
fixed.

Scale handling matches the loop-correction convention used elsewhere in
this package: the Sim3 scale is folded into the SE3 translations and the
point cloud, so the merged map is a consistent metric rescale of the
dropped map (the reference does the same through
KeyFrame::SetPose(Tcw/s), src/LoopClosing.cc:1252 region).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .map import Atlas, SLAMMap

F32 = np.float32


def world_sim3_from_camera_sim3(
    kf_drop_R: np.ndarray, kf_drop_t: np.ndarray,
    kf_keep_R: np.ndarray, kf_keep_t: np.ndarray,
    S_R: np.ndarray, S_t: np.ndarray, S_s: float,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Lift a camera-frame Sim3 (p_keepcam = s S_R p_dropcam + S_t,
    from the Sim3 RANSAC between the two matched keyframes) to the
    world-to-world Sim3 p_keepworld = sw Rw p_dropworld + tw."""
    R1, t1 = kf_drop_R, kf_drop_t
    R2, t2 = kf_keep_R, kf_keep_t
    Rw = (R2.T @ S_R @ R1).astype(F32)
    tw = (R2.T @ (S_s * (S_R @ t1) + S_t - t2)).astype(F32)
    return Rw, tw, float(S_s)


def merge_maps(
    atlas: Atlas,
    drop: SLAMMap,
    keep: SLAMMap,
    kf_drop_id: int,
    kf_keep_id: int,
    S_R: np.ndarray,
    S_t: np.ndarray,
    S_s: float,
    project=None,
    inv_sigma2: Optional[Sequence[float]] = None,
) -> Dict:
    """Weld `drop` into `keep` and make `keep` the active map.

    Returns {"kf_remap", "mp_remap", "world_sim3": (Rw, tw, sw)} so the
    caller (tracker / loop closer) can fix its keyframe references and
    re-express any trajectory recorded in drop-map coordinates.
    """
    kf1 = drop.keyframes[kf_drop_id]
    kf2 = keep.keyframes[kf_keep_id]
    Rw, tw, sw = world_sim3_from_camera_sim3(
        kf1.R, kf1.t, kf2.R, kf2.t, S_R, S_t, S_s
    )

    # ---- transform drop-map keyframes into keep-world coordinates.
    # x_cam' = R' p_keep + t' reproduces sw * x_cam (consistent rescale).
    for kf in drop.keyframes.values():
        Rn = (kf.R @ Rw.T).astype(F32)
        tn = (sw * kf.t - Rn @ tw).astype(F32)
        kf.R, kf.t = Rn, tn
        if kf.v is not None:
            kf.v = (sw * (Rw @ kf.v)).astype(F32)

    # ---- append keyframes (ascending original id keeps the temporal
    # chain order; prev_kf links are remapped after all ids exist).
    kf_remap: Dict[int, int] = {}
    old_prev: Dict[int, int] = {}
    for kid in sorted(drop.keyframes):
        kf = drop.keyframes[kid]
        old_prev[kid] = kf.prev_kf
        keep.add_keyframe(kf)  # reassigns kf.kid
        kf_remap[kid] = kf.kid
    for kid, new_id in kf_remap.items():
        keep.keyframes[new_id].prev_kf = kf_remap.get(old_prev[kid], -1)

    # ---- transform + append map points.
    n = drop._next_mp
    new_pos = (sw * drop.mp_pos[:n] @ Rw.T + tw).astype(F32)
    new_normal = (drop.mp_normal[:n] @ Rw.T).astype(F32)
    mp_remap: Dict[int, int] = {}
    for p in range(n):
        if not drop.mp_valid[p]:
            continue
        first = kf_remap.get(int(drop.mp_first_kf[p]), -1)
        new_id = keep.add_point(
            new_pos[p], drop.mp_desc[p], new_normal[p],
            sw * float(drop.mp_max_dist[p]), first,
        )
        keep.mp_visible[new_id] = drop.mp_visible[p]
        keep.mp_found[new_id] = drop.mp_found[p]
        mp_remap[p] = new_id
        keep.obs[new_id] = {
            kf_remap[k]: kp
            for k, kp in drop.obs.get(p, {}).items()
            if k in kf_remap
        }
    # keypoint -> map-point links now point at keep-map ids
    for new_id in kf_remap.values():
        kf = keep.keyframes[new_id]
        kf.kp_mp = np.array(
            [mp_remap.get(int(m), -1) if m >= 0 else -1 for m in kf.kp_mp],
            kf.kp_mp.dtype,
        )

    # ---- transfer dead-keyframe tombstones under FRESH ids: kf ids are
    # per-map counters, so reusing the dropped map's ids verbatim could
    # silently clobber an existing kept-map tombstone.  Relative
    # transforms are rotation-invariant under the world Sim3; their
    # translations carry the scale (same convention as
    # SLAMMap.apply_scaled_rotation).
    dead_remap: Dict[int, int] = {}
    for k in sorted(drop.dead_kfs):
        dead_remap[k] = keep._next_kf
        keep._next_kf += 1
    for k, (pk, R_cp, t_cp) in drop.dead_kfs.items():
        new_pk = kf_remap.get(pk, dead_remap.get(pk, -1))
        keep.dead_kfs[dead_remap[k]] = (
            new_pk, R_cp, (sw * t_cp).astype(F32)
        )

    # inertial flags: welded map is initialised if either side was
    keep.imu_initialized = keep.imu_initialized or drop.imu_initialized
    keep.imu_ba1 = keep.imu_ba1 or drop.imu_ba1
    keep.imu_ba2 = keep.imu_ba2 or drop.imu_ba2

    # ---- Atlas bookkeeping: keep becomes (stays) the live map.
    atlas.remove_map(drop.mid)
    if keep in atlas.maps:
        atlas.active = atlas.maps.index(keep)
    keep.version += 1

    return {
        "type": "merge",
        "kf_remap": kf_remap,
        "mp_remap": mp_remap,
        "world_sim3": (Rw, tw, sw),
        "kf_cur": kf_remap[kf_drop_id],
        "kf_matched": kf_keep_id,
        "dropped_mid": drop.mid,
        "dead_remap": dead_remap,
    }


def weld_bundle_adjustment(
    mp: SLAMMap,
    kf_cur: int,
    kf_matched: int,
    project,
    inv_sigma2: Sequence[float],
    n_iters: int = 10,
    window: int = 8,
    async_apply: bool = False,
):
    """MergeBundleAdjustmentVisual analog (src/Optimizer.cc:5759):
    optimise the covisible windows around both seam keyframes; other
    observers of the windows' points are included fixed."""
    from .local_mapping import run_ba

    local = {kf_cur, kf_matched}
    for seed in (kf_cur, kf_matched):
        if seed not in mp.keyframes:
            continue
        for k, _ in mp.covisible_keyframes(seed, min_weight=5)[:window]:
            local.add(k)
    # fixed boundary: other observers of the window's points
    fixed = set()
    for p in mp.points_seen_by(sorted(local)):
        for k in mp.obs.get(int(p), {}):
            if k not in local:
                fixed.add(k)
    fixed = set(sorted(fixed)[: 2 * window])
    if not fixed:
        # gauge: freeze the matched keyframe (the kept map's frame)
        fixed = {kf_matched}
        local.discard(kf_matched)
    return run_ba(
        mp, sorted(local | fixed), fixed, project, inv_sigma2,
        n_iters=n_iters, async_apply=async_apply,
    )


def weld_inertial_bundle_adjustment(
    mp: SLAMMap, calib, project, kf_cur: int, n_window: int = 10,
) -> bool:
    """MergeInertialBA analog (reference src/Optimizer.cc:6760): after an
    inertial Atlas weld, refine the temporal window around the seam with
    the visual + preintegration + bias-RW window BA.  The welded map's
    prev_kf chain and (Sim3-corrected) velocities were preserved by
    merge_maps, so the seam window is exactly the LocalInertialBA shape.
    """
    from . import imu_frontend

    return imu_frontend.local_inertial_ba(
        mp, calib, project, kf_cur, n_window=n_window,
    )
