"""Checkpoint / resume of the full SLAM session.

The reference carries boost::serialization hooks on its whole object
graph (inc/KeyFrame.h:56-146 serializes pose, velocity, bias, the
stereo channels, the spanning tree, loop edges, and the preintegrated
IMU chain; inc/System.h:180-186 SaveAtlas/LoadAtlas).  Because our map
state is already explicit arrays, checkpointing is one compressed npz:

- ``save_map``/``load_map``: one SLAMMap with every keyframe field
  (incl. ur/depth/v/bg/ba, parent, prev_kf, loop_edges, the raw IMU
  measurement window and its Preintegrated).
- ``save_session``/``load_session``: the whole Tracker — all Atlas
  maps, the keyframe-database entries, and the tracking-thread resume
  state (last frame, velocity, bias, IMU queue tail, trajectory) — so
  an inertial stereo session can stop mid-sequence and keep tracking.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..frontend.extractor import Features
from .map import Atlas, KeyFrame, SLAMMap

import jax.numpy as jnp

_PREINT_FIELDS = (
    "dR", "dV", "dP", "C", "JRg", "JVg", "JVa", "JPg", "JPa", "dT", "bias"
)


def _put_preint(blobs: dict, prefix: str, preint):
    if preint is None:
        return
    for f in _PREINT_FIELDS:
        blobs[f"{prefix}_preint_{f}"] = np.asarray(getattr(preint, f))


def _get_preint(z, prefix: str):
    key0 = f"{prefix}_preint_dR"
    if key0 not in z:
        return None
    from ..imu import preintegration as pre

    return pre.Preintegrated(**{
        f: jnp.asarray(z[f"{prefix}_preint_{f}"]) for f in _PREINT_FIELDS
    })


def _put_opt(blobs: dict, key: str, arr):
    if arr is not None:
        blobs[key] = np.asarray(arr)


def _get_opt(z, key: str):
    return np.asarray(z[key]) if key in z else None


def _put_kf(blobs: dict, p: str, kf: KeyFrame):
    blobs[f"{p}_R"] = kf.R
    blobs[f"{p}_t"] = kf.t
    blobs[f"{p}_meta"] = np.asarray(
        [kf.frame_id, kf.timestamp, kf.parent, kf.prev_kf], np.float64
    )
    blobs[f"{p}_xy_un"] = kf.xy_un
    blobs[f"{p}_octave"] = kf.octave
    blobs[f"{p}_angle"] = kf.angle
    blobs[f"{p}_desc"] = kf.desc
    blobs[f"{p}_valid"] = kf.valid
    blobs[f"{p}_kp_mp"] = kf.kp_mp
    blobs[f"{p}_xy"] = np.asarray(kf.feats.xy)
    blobs[f"{p}_resp"] = np.asarray(kf.feats.response)
    blobs[f"{p}_size"] = np.asarray(kf.feats.size)
    blobs[f"{p}_loop_edges"] = np.asarray(kf.loop_edges, np.int64)
    _put_opt(blobs, f"{p}_ur", kf.ur)
    _put_opt(blobs, f"{p}_depth", kf.depth)
    _put_opt(blobs, f"{p}_v", kf.v)
    _put_opt(blobs, f"{p}_bg", kf.bg)
    _put_opt(blobs, f"{p}_ba", kf.ba)
    if kf.imu_meas is not None:
        blobs[f"{p}_imu_gyro"] = kf.imu_meas[0]
        blobs[f"{p}_imu_acc"] = kf.imu_meas[1]
        blobs[f"{p}_imu_dt"] = kf.imu_meas[2]
    _put_preint(blobs, p, kf.preint)


def _get_kf(z, p: str, kid: int) -> KeyFrame:
    meta = z[f"{p}_meta"]
    feats = Features(
        xy=jnp.asarray(z[f"{p}_xy"]),
        response=jnp.asarray(z[f"{p}_resp"]),
        angle=jnp.asarray(z[f"{p}_angle"]),
        octave=jnp.asarray(z[f"{p}_octave"]),
        size=jnp.asarray(z[f"{p}_size"]),
        desc=jnp.asarray(z[f"{p}_desc"]),
        valid=jnp.asarray(z[f"{p}_valid"]),
    )
    imu_meas = None
    if f"{p}_imu_gyro" in z:
        imu_meas = (
            np.asarray(z[f"{p}_imu_gyro"]),
            np.asarray(z[f"{p}_imu_acc"]),
            np.asarray(z[f"{p}_imu_dt"]),
        )
    return KeyFrame(
        kid=kid, frame_id=int(meta[0]), timestamp=float(meta[1]),
        R=np.asarray(z[f"{p}_R"]), t=np.asarray(z[f"{p}_t"]), feats=feats,
        xy_un=np.asarray(z[f"{p}_xy_un"]), octave=np.asarray(z[f"{p}_octave"]),
        angle=np.asarray(z[f"{p}_angle"]), desc=np.asarray(z[f"{p}_desc"]),
        valid=np.asarray(z[f"{p}_valid"]), kp_mp=z[f"{p}_kp_mp"].copy(),
        parent=int(meta[2]), prev_kf=int(meta[3]),
        loop_edges=[int(e) for e in z[f"{p}_loop_edges"]]
        if f"{p}_loop_edges" in z else [],
        ur=_get_opt(z, f"{p}_ur"), depth=_get_opt(z, f"{p}_depth"),
        v=_get_opt(z, f"{p}_v"), bg=_get_opt(z, f"{p}_bg"),
        ba=_get_opt(z, f"{p}_ba"),
        imu_meas=imu_meas, preint=_get_preint(z, p),
    )


def _put_frame(blobs: dict, p: str, lf):
    """Serialize a live Frame (last frame / init frame) with its RAW
    keypoint fields — xy/response/size are what motion matching uses, so
    resuming a distorted-lens session must not substitute xy_un."""
    lf.ensure_host()
    blobs[f"{p}_meta"] = np.asarray([lf.frame_id, lf.timestamp], np.float64)
    blobs[f"{p}_xy_un"] = lf.xy_un
    blobs[f"{p}_octave"] = lf.octave
    blobs[f"{p}_angle"] = lf.angle
    blobs[f"{p}_desc"] = lf.desc
    blobs[f"{p}_valid"] = lf.valid
    blobs[f"{p}_kp_mp"] = lf.kp_mp
    blobs[f"{p}_xy"] = np.asarray(lf.feats.xy)
    blobs[f"{p}_resp"] = np.asarray(lf.feats.response)
    blobs[f"{p}_size"] = np.asarray(lf.feats.size)
    _put_opt(blobs, f"{p}_R", lf.R)
    _put_opt(blobs, f"{p}_t", lf.t)
    _put_opt(blobs, f"{p}_ur", lf.ur)
    _put_opt(blobs, f"{p}_depth", lf.depth)
    _put_opt(blobs, f"{p}_v", lf.v)
    _put_opt(blobs, f"{p}_bg", lf.bg)
    _put_opt(blobs, f"{p}_ba", lf.ba)
    _put_preint(blobs, p, lf.preint_frame)


def _get_frame(z, p: str, Frame):
    from ..frontend.extractor import Features as F

    n_cap = len(z[f"{p}_valid"])
    raw_xy = z[f"{p}_xy"] if f"{p}_xy" in z else z[f"{p}_xy_un"]
    resp = z[f"{p}_resp"] if f"{p}_resp" in z else np.zeros(n_cap)
    size = z[f"{p}_size"] if f"{p}_size" in z else np.full(n_cap, 31.0)
    feats = F(
        xy=jnp.asarray(raw_xy),
        response=jnp.asarray(resp),
        angle=jnp.asarray(z[f"{p}_angle"]),
        octave=jnp.asarray(z[f"{p}_octave"]),
        size=jnp.asarray(size),
        desc=jnp.asarray(z[f"{p}_desc"]),
        valid=jnp.asarray(z[f"{p}_valid"]),
    )
    return Frame(
        frame_id=int(z[f"{p}_meta"][0]), timestamp=float(z[f"{p}_meta"][1]),
        feats=feats, xy_un=np.asarray(z[f"{p}_xy_un"]),
        # device copy of the undistorted coords must survive the round
        # trip: a session resumed MID-monocular-init on a distorted lens
        # otherwise feeds raw pixel coords into the init matching
        # (_monocular_initialization reads f.un_dev else f.feats.xy)
        un_dev=jnp.asarray(z[f"{p}_xy_un"]),
        octave=np.asarray(z[f"{p}_octave"]),
        angle=np.asarray(z[f"{p}_angle"]), desc=np.asarray(z[f"{p}_desc"]),
        valid=np.asarray(z[f"{p}_valid"]), kp_mp=z[f"{p}_kp_mp"].copy(),
        R=_get_opt(z, f"{p}_R"), t=_get_opt(z, f"{p}_t"),
        ur=_get_opt(z, f"{p}_ur"), depth=_get_opt(z, f"{p}_depth"),
        v=_get_opt(z, f"{p}_v"), bg=_get_opt(z, f"{p}_bg"),
        ba=_get_opt(z, f"{p}_ba"), preint_frame=_get_preint(z, p),
    )


def _put_map(blobs: dict, p: str, mp: SLAMMap):
    n = mp._next_mp
    kf_ids = sorted(mp.keyframes.keys())
    blobs[f"{p}mp_pos"] = mp.mp_pos[:n]
    blobs[f"{p}mp_desc"] = mp.mp_desc[:n]
    blobs[f"{p}mp_normal"] = mp.mp_normal[:n]
    blobs[f"{p}mp_max_dist"] = mp.mp_max_dist[:n]
    blobs[f"{p}mp_valid"] = mp.mp_valid[:n]
    blobs[f"{p}mp_first_kf"] = mp.mp_first_kf[:n]
    blobs[f"{p}mp_visible"] = mp.mp_visible[:n]
    blobs[f"{p}mp_found"] = mp.mp_found[:n]
    blobs[f"{p}kf_ids"] = np.asarray(kf_ids, np.int64)
    blobs[f"{p}map_meta"] = np.asarray(
        [mp._next_kf, mp.mid, int(mp.imu_initialized), int(mp.imu_ba1),
         int(mp.imu_ba2), mp.version], np.int64
    )
    blobs[f"{p}scale_factor"] = np.asarray([mp.scale_factor])
    blobs[f"{p}obs"] = np.asarray(
        [(q, k, i) for q, d in mp.obs.items() for k, i in d.items()],
        np.int64,
    ).reshape(-1, 3)
    if mp.dead_kfs:
        dk = sorted(mp.dead_kfs.items())
        blobs[f"{p}dead_ids"] = np.asarray(
            [(k, pk) for k, (pk, _, _) in dk], np.int64
        )
        blobs[f"{p}dead_R"] = np.stack([R for _, (_, R, _) in dk])
        blobs[f"{p}dead_t"] = np.stack([t for _, (_, _, t) in dk])
    for k in kf_ids:
        _put_kf(blobs, f"{p}kf{k}", mp.keyframes[k])


def _get_map(z, p: str) -> SLAMMap:
    n = len(z[f"{p}mp_pos"])
    mp = SLAMMap(capacity=max(n, 1024))
    mp._next_mp = n
    mp.mp_pos[:n] = z[f"{p}mp_pos"]
    mp.mp_desc[:n] = z[f"{p}mp_desc"]
    mp.mp_normal[:n] = z[f"{p}mp_normal"]
    mp.mp_max_dist[:n] = z[f"{p}mp_max_dist"]
    mp.mp_valid[:n] = z[f"{p}mp_valid"]
    mp.mp_first_kf[:n] = z[f"{p}mp_first_kf"]
    mp.mp_visible[:n] = z[f"{p}mp_visible"]
    mp.mp_found[:n] = z[f"{p}mp_found"]
    meta = z[f"{p}map_meta"]
    mp._next_kf = int(meta[0])
    mp.mid = int(meta[1])
    mp.imu_initialized = bool(meta[2])
    mp.imu_ba1 = bool(meta[3])
    mp.imu_ba2 = bool(meta[4])
    mp.version = int(meta[5])
    if f"{p}scale_factor" in z:
        mp.scale_factor = float(z[f"{p}scale_factor"][0])
    mp.obs = {}
    for q, k, i in z[f"{p}obs"]:
        mp.obs.setdefault(int(q), {})[int(k)] = int(i)
    if f"{p}dead_ids" in z:
        for (k, pk), R, t in zip(z[f"{p}dead_ids"], z[f"{p}dead_R"],
                                 z[f"{p}dead_t"]):
            mp.dead_kfs[int(k)] = (int(pk), np.asarray(R), np.asarray(t))
    for k in z[f"{p}kf_ids"]:
        mp.keyframes[int(k)] = _get_kf(z, f"{p}kf{int(k)}", int(k))
    return mp


# ------------------------------------------------------------- map API


def save_map(mp: SLAMMap, path: str):
    blobs: dict = {}
    _put_map(blobs, "", mp)
    # legacy single-map keys kept for compatibility
    blobs["next_kf"] = np.asarray([mp._next_kf])
    np.savez_compressed(path, **blobs)


def load_map(path: str) -> SLAMMap:
    z = np.load(path)
    return _get_map(z, "")


# --------------------------------------------------------- session API


def save_session(tracker, path: str):
    """Serialize the full Tracker: Atlas (all maps), keyframe database,
    and the tracking-thread resume state."""
    blobs: dict = {}
    atlas = tracker.atlas
    # settle in-flight pipelined frames and any async window BA before
    # serializing poses
    tracker.flush()
    tracker.local_mapper.flush_ba(atlas.current)
    blobs["n_maps"] = np.asarray([len(atlas.maps)])
    blobs["active"] = np.asarray([atlas.active])
    blobs["next_mid"] = np.asarray([atlas._next_mid])
    for j, m in enumerate(atlas.maps):
        _put_map(blobs, f"m{j}_", m)

    st = tracker
    blobs["trk_meta"] = np.asarray([
        st.state.value, st._next_frame_id, st.last_kf_frame_id,
        st.ref_kf if st.ref_kf is not None else -1,
        st._prev_kf_id, st._frames_lost, st._map_traj_start,
    ], np.int64)
    blobs["trk_fmeta"] = np.asarray([
        st.last_kf_ts if st.last_kf_ts is not None else np.nan,
        st.first_kf_ts if st.first_kf_ts is not None else np.nan,
        st._lost_ts,
    ], np.float64)
    blobs["trk_bias"] = st.cur_bias
    if st.velocity is not None:
        blobs["trk_vel_R"] = st.velocity[0]
        blobs["trk_vel_t"] = st.velocity[1]
    if st.trajectory:
        blobs["traj_ts"] = np.asarray([t for t, _, _ in st.trajectory])
        blobs["traj_R"] = np.stack([R for _, R, _ in st.trajectory])
        blobs["traj_t"] = np.stack([t for _, _, t in st.trajectory])
    if st.traj_rel:
        blobs["trel_meta"] = np.asarray(
            [(ts, mid, k) for ts, mid, k, _, _ in st.traj_rel], np.float64
        )
        blobs["trel_R"] = np.stack([R for _, _, _, R, _ in st.traj_rel])
        blobs["trel_t"] = np.stack([t for _, _, _, _, t in st.traj_rel])
    if st.last_frame is not None:
        _put_frame(blobs, "lf", st.last_frame)
    # mid-monocular-initialization state: without these, a session
    # saved between the two init frames would silently restart
    # initialization on resume
    if st.init_frame is not None:
        _put_frame(blobs, "if", st.init_frame)
    if st.prev_matched is not None:
        blobs["prev_matched"] = st.prev_matched
    if st.imu_queue is not None:
        t, g, a = st.imu_queue.snapshot()
        blobs["imuq_t"] = t
        blobs["imuq_gyro"] = g
        blobs["imuq_acc"] = a
    db = st.loop_closer.db
    if db is not None and db.entries:
        keys = sorted(db.entries.keys())
        words = [db.entries[k][0] for k in keys]
        blobs["db_keys"] = np.asarray(keys, np.int64)
        blobs["db_lens"] = np.asarray([len(w) for w in words], np.int64)
        blobs["db_words"] = np.concatenate(words)
        blobs["db_weights"] = np.concatenate(
            [db.entries[k][1] for k in keys]
        )
    np.savez_compressed(path, **blobs)


def load_session(path: str, cfg, vocab=None):
    """Reconstruct a Tracker from a session checkpoint.  ``cfg`` (and
    ``vocab``) must match the ones the session was created with."""
    from .tracking import Frame, Tracker, TrackState

    z = np.load(path)
    tr = Tracker(cfg, vocab=vocab)
    atlas = tr.atlas
    atlas.maps = [_get_map(z, f"m{j}_") for j in range(int(z["n_maps"][0]))]
    atlas.active = int(z["active"][0])
    atlas._next_mid = int(z["next_mid"][0])

    meta = z["trk_meta"]
    tr.state = TrackState(int(meta[0]))
    tr._next_frame_id = int(meta[1])
    tr.last_kf_frame_id = int(meta[2])
    tr.ref_kf = int(meta[3]) if int(meta[3]) >= 0 else None
    tr._prev_kf_id = int(meta[4])
    tr._frames_lost = int(meta[5])
    tr._map_traj_start = int(meta[6])
    fmeta = z["trk_fmeta"]
    tr.last_kf_ts = None if np.isnan(fmeta[0]) else float(fmeta[0])
    tr.first_kf_ts = None if np.isnan(fmeta[1]) else float(fmeta[1])
    tr._lost_ts = float(fmeta[2])
    tr.cur_bias = np.asarray(z["trk_bias"]).copy()
    if "trk_vel_R" in z:
        tr.velocity = (np.asarray(z["trk_vel_R"]),
                       np.asarray(z["trk_vel_t"]))
    if "traj_ts" in z:
        tr.trajectory = [
            (float(ts), R.copy(), t.copy())
            for ts, R, t in zip(z["traj_ts"], z["traj_R"], z["traj_t"])
        ]
    if "trel_meta" in z:
        tr.traj_rel = [
            (float(m[0]), int(m[1]), int(m[2]), R.copy(), t.copy())
            for m, R, t in zip(z["trel_meta"], z["trel_R"], z["trel_t"])
        ]
    if "lf_meta" in z:
        tr.last_frame = _get_frame(z, "lf", Frame)
    if "if_meta" in z:
        tr.init_frame = _get_frame(z, "if", Frame)
    if "prev_matched" in z:
        tr.prev_matched = np.asarray(z["prev_matched"]).copy()
    if tr.imu_queue is not None and "imuq_t" in z:
        tr.imu_queue.restore(
            np.asarray(z["imuq_t"]), np.asarray(z["imuq_gyro"]),
            np.asarray(z["imuq_acc"]),
        )
    db = tr.loop_closer.db
    if db is not None and "db_keys" in z:
        off = 0
        for key, ln in zip(z["db_keys"], z["db_lens"]):
            db.entries[int(key)] = (
                np.asarray(z["db_words"][off:off + ln]),
                np.asarray(z["db_weights"][off:off + ln]),
            )
            off += int(ln)
        db._dirty = True
    return tr
