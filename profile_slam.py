"""Ad-hoc wall-clock profile of the full System loop (bench.py's
_full_slam_bench scenario): wraps the tracker / local mapper methods
and reports second-run per-method totals to find where the time goes."""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import cv2
import numpy as np

from test_slam_e2e import render_sequence, W, H
from extractorb_tpu.config import CameraConfig, ORBConfig, SLAMConfig, TrackingConfig
from extractorb_tpu.slam.system import System
from extractorb_tpu.slam import tracking as trk
from extractorb_tpu.slam import local_mapping as lmm
from extractorb_tpu.slam import track_device as td

N_FRAMES = int(os.environ.get("N_FRAMES", "14"))

luna = cv2.imread("/root/reference/pic/luna.jpg", 0)
tex = cv2.resize(luna, (1024, 1024))
SPEED = float(os.environ.get("SPEED", "0.12"))
frames, poses = render_sequence(tex, n_frames=N_FRAMES, speed=SPEED)

acc = defaultdict(float)
cnt = defaultdict(int)
enabled = [False]


def wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        if not enabled[0]:
            return orig(self, *a, **kw)
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            dt = time.perf_counter() - t0
            acc[f"{cls.__name__}.{name}"] += dt
            cnt[f"{cls.__name__}.{name}"] += 1

    setattr(cls, name, timed)


for m in ["_make_frame", "_track_fused", "_confirm_pipe", "_replay", "flush", "_track_existing", "_track_frame",
          "_track_with_motion_model", "_track_reference_keyframe",
          "_track_local_map", "_pose_opt", "_create_keyframe",
          "_monocular_initialization", "_need_new_keyframe", "_promote",
          "_create_initial_map"]:
    wrap(trk.Tracker, m)
from extractorb_tpu.slam.tracking import Frame
wrap(Frame, "ensure_host")
import extractorb_tpu.geometry.two_view as tvv
for fn in ["reconstruct"]:
    if hasattr(tvv, fn):
        orig = getattr(tvv, fn)
        def mk2(o, nm):
            def f(*a, **kw):
                t0 = time.perf_counter()
                try:
                    return o(*a, **kw)
                finally:
                    if enabled[0]:
                        acc[nm] += time.perf_counter() - t0
                        cnt[nm] += 1
            return f
        setattr(tvv, fn, mk2(orig, fn))
orig_blb = td.build_local_block
def blb(*a, **kw):
    t0 = time.perf_counter()
    try:
        return orig_blb(*a, **kw)
    finally:
        if enabled[0]:
            acc["build_local_block"] += time.perf_counter() - t0
            cnt["build_local_block"] += 1
td.build_local_block = blb
trk.td.build_local_block = blb
for m in ["process_keyframe", "_cull_map_points",
          "_create_new_points_dispatch", "_create_new_points_apply",
          "_fuse_dispatch", "_fuse_apply_all", "_local_ba",
          "_cull_keyframes", "_assign_parent", "_apply_fuse",
          "_median_depth"]:
    wrap(lmm.LocalMapper, m)
wrap(td.MapMirror, "sync")
from extractorb_tpu.slam.map import SLAMMap
for m in ["update_point_stats", "covisible_keyframes", "points_seen_by",
          "add_observation", "add_point", "update_point_stats_batch"]:
    wrap(SLAMMap, m)
orig_rba = lmm.run_ba
def rba(*a, **kw):
    t0 = time.perf_counter()
    try:
        return orig_rba(*a, **kw)
    finally:
        if enabled[0]:
            acc["run_ba"] += time.perf_counter() - t0
            cnt["run_ba"] += 1
lmm.run_ba = rba
import extractorb_tpu.frontend.matcher as fmm
for fn in ["search_for_initialization"]:
    o = getattr(fmm, fn)
    def mk3(o, nm):
        def f(*a, **kw):
            t0 = time.perf_counter()
            try:
                return o(*a, **kw)
            finally:
                if enabled[0]:
                    acc[nm] += time.perf_counter() - t0
                    cnt[nm] += 1
        return f
    setattr(fmm, fn, mk3(o, fn))
    trk.fm.search_for_initialization = getattr(fmm, fn)


def run():
    cfg = SLAMConfig(
        orb=ORBConfig(n_features=1000),
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                            width=W, height=H),
        tracking=TrackingConfig(max_frames=6, pipeline_depth=int(os.environ.get("DEPTH","3"))),
    )
    s = System(cfg)
    t0 = time.perf_counter()
    per_frame = []
    for k, im in enumerate(frames):
        f0 = time.perf_counter()
        s.track_monocular(im, k / 30.0)
        per_frame.append(time.perf_counter() - f0)
    s.flush()
    return s, time.perf_counter() - t0, per_frame


run()  # warmup/compile
enabled[0] = True
s, dt, per_frame = run()
print(f"total {dt:.2f}s  fps {len(frames)/dt:.2f}")
print("per-frame ms:", " ".join(f"{1e3*x:.0f}" for x in per_frame))
for k in sorted(acc, key=lambda k: -acc[k]):
    print(f"{acc[k]*1e3:9.1f} ms  x{cnt[k]:<4d} {k}")
