"""Diagnose the 40-frame steady-state drift (VERDICT r4 next-1).

Runs the bench's scenario B (40 frames, speed 0.06) and reports:
- per-frame position error after Sim3 alignment (where does drift grow?)
- per-frame scale: ratio of est step length to gt step length (scale drift?)
- keyframe timeline, map point count, culling stats

Usage: python diag_drift.py [pipeline_depth] [n_frames] [speed]
"""

import os
import sys

if os.environ.get("DIAG_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

import numpy as np
import cv2

from test_slam_e2e import render_sequence, umeyama_align, W, H
from extractorb_tpu.config import (
    CameraConfig, ORBConfig, SLAMConfig, TrackingConfig,
)
from extractorb_tpu.slam.system import System


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    speed = float(sys.argv[3]) if len(sys.argv) > 3 else 0.06

    luna = cv2.imread("/root/reference/pic/luna.jpg", 0)
    tex = cv2.resize(luna, (1024, 1024))
    frames, poses = render_sequence(tex, n_frames=n_frames, speed=speed)

    cfg = SLAMConfig(
        orb=ORBConfig(n_features=1000),
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                            width=W, height=H),
        tracking=TrackingConfig(max_frames=6, pipeline_depth=depth),
    )
    s = System(cfg)

    # instrument: snapshot the ref KF pose used by each _record_traj
    from extractorb_tpu.slam import tracking as T
    snaps = []
    orig = T.Tracker._record_traj
    def patched(self, ts, R, t):
        k = self.ref_kf
        mp = self.atlas.current
        if k is not None and k in mp.keyframes:
            kf = mp.keyframes[k]
            R_rel0 = R @ kf.R.T
            t_rel0 = t - R_rel0 @ kf.t
            snaps.append((ts, k, kf.R.copy(), kf.t.copy(),
                          float(np.linalg.norm(R_rel0 - np.eye(3))),
                          float(np.linalg.norm(t_rel0))))
        else:
            snaps.append((ts, -1, None, None, 0.0, 0.0))
        return orig(self, ts, R, t)
    T.Tracker._record_traj = patched

    states = [s.track_monocular(im, k / 30.0) for k, im in enumerate(frames)]
    s.flush()

    traj = s.tracker.final_trajectory()
    est = np.array([-R.T @ t for _, R, t in traj])
    ks = [int(round(ts * 30.0)) for ts, _, _ in traj]
    gt = np.array([-poses[k][0].T @ poses[k][1] for k in ks])
    aligned, scale = umeyama_align(est, gt, return_scale=True)
    err = np.sqrt(((aligned - gt) ** 2).sum(-1))
    ate = np.sqrt((err ** 2).mean())

    print(f"states: {[str(st).split('.')[-1][:2] for st in states]}")
    print(f"n_traj={len(traj)} ate={ate:.4f} global_scale={scale:.4f}")
    print(f"n_kfs={s.n_keyframes()} n_pts={s.n_map_points()}")

    # per-frame error and per-step scale ratio
    step_est = np.linalg.norm(np.diff(aligned, axis=0), axis=1)
    step_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1)
    ratio = step_est / np.maximum(step_gt, 1e-9)
    print("frame  err     step_scale")
    for i, k in enumerate(ks):
        r = f"{ratio[i - 1]:.3f}" if i > 0 else "  -  "
        print(f"{k:4d}  {err[i]:.4f}  {r}")

    # keyframe ids/timestamps
    m = s.tracker.atlas.current
    print(f"kf ids: {sorted(m.keyframes.keys())}  dead: {sorted(m.dead_kfs.keys())}")
    for kid in sorted(m.keyframes.keys()):
        kf = m.keyframes[kid]
        C = -kf.R.T @ kf.t
        npts = int(np.sum([1 for d in m.obs.values() if kid in d]))
        print(f"  kf {kid}: ts={kf.timestamp:.3f} C=({C[0]:+.3f},{C[1]:+.3f},{C[2]:+.3f}) obs={npts}")
    # raw (unaligned) est step lengths — is the scale drift in the est?
    step_est = np.linalg.norm(np.diff(est, axis=0), axis=1)
    print("raw est steps:", " ".join(f"{v:.4f}" for v in step_est))
    live = np.array([-R.T @ t for _, R, t in s.tracker.trajectory])
    step_live = np.linalg.norm(np.diff(live, axis=0), axis=1)
    print("live est steps:", " ".join(f"{v:.4f}" for v in step_live))
    mids = [e[1] for e in s.tracker.traj_rel]
    print(f"traj mids: {sorted(set(mids))}  current mid: {m.mid}  "
          f"atlas maps: {[mm.mid for mm in getattr(s.tracker.atlas, 'maps', [])] if hasattr(s.tracker.atlas, 'maps') else '?'}")
    lc = getattr(s.tracker, 'loop_closer', None)
    print(f"loop closer events: {getattr(lc, 'n_loops', '?')} loops, "
          f"{getattr(lc, 'n_merges', '?')} merges")
    print("frame refkf  final_C                live_C")
    for i, (ts, mid, kf_id, R_rel, t_rel) in enumerate(s.tracker.traj_rel):
        _, Rf, tf = traj[i]
        Cf = -Rf.T @ tf
        Cl = live[i]
        tag = "DEAD" if kf_id in m.dead_kfs else ""
        snap = next((sn for sn in snaps if abs(sn[0] - ts) < 1e-9), None)
        kc = ""
        if snap and snap[1] >= 0 and snap[2] is not None:
            Ck_rec = -snap[2].T @ snap[3]
            kc = (f" kfrec=({Ck_rec[0]:+.3f},{Ck_rec[2]:+.3f})"
                  f" rec(|dR|={snap[4]:.3f},|dt|={snap[5]:.3f})")
        kc += f" now(|dR|={np.linalg.norm(R_rel - np.eye(3)):.3f},|dt|={np.linalg.norm(t_rel):.3f})"
        print(f"{int(round(ts*30)):4d}  {kf_id:3d}{tag:4s} "
              f"({Cf[0]:+.3f},{Cf[1]:+.3f},{Cf[2]:+.3f})  "
              f"({Cl[0]:+.3f},{Cl[1]:+.3f},{Cl[2]:+.3f}){kc}")


if __name__ == "__main__":
    main()
