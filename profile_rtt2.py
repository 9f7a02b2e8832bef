"""Break down the fused tracking step's 68 ms/frame on the tunneled
TPU: null round trip, image upload, dispatch-only, fetch sizes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from test_slam_e2e import render_sequence, W, H
from extractorb_tpu.config import CameraConfig, ORBConfig, SLAMConfig, TrackingConfig
from extractorb_tpu.slam.system import System


def timeit(label, fn, n=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:42s} {dt:8.2f} ms")
    return dt


# 3. the fused step itself on live state
luna = cv2.imread("/root/reference/pic/luna.jpg", 0)
tex = cv2.resize(luna, (1024, 1024))
frames, poses = render_sequence(tex, n_frames=14)

from extractorb_tpu.slam import tracking as trk
from extractorb_tpu.slam import track_device as td

cfg = SLAMConfig(
    orb=ORBConfig(n_features=1000),
    camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                        width=W, height=H),
    tracking=TrackingConfig(max_frames=6),
)
sysm = System(cfg)
for i, f in enumerate(frames):
    sysm.track_monocular(f, i / 30.0)

tr = sysm.tracker
assert tr._fused_applicable(), tr.state
mp = tr.atlas.current
tr._mirror.sync(mp)
blk = tr._fused_local[1]
step = td.get_track_step(cfg.camera, cfg.orb, frames[0].shape,
                         tr._mirror.cap, tr._fused_local_cap)
last = tr.last_frame
R_pred, t_pred = tr._predict_pose()
Rp = jnp.asarray(R_pred)
tp = jnp.asarray(t_pred)
last_kp = last.kp_mp_dev if last.kp_mp_dev is not None else jnp.asarray(last.kp_mp)
img_j = jnp.asarray(frames[-1])


def dispatch(im):
    return step(
        im, last.un_dev, last.feats.desc, last.feats.octave,
        last.feats.angle, last_kp, tr._mirror.pos, tr._mirror.valid,
        blk.ids_dev, blk.pos, blk.desc, blk.norm, blk.maxd, blk.val,
        Rp, tp,
    )


timeit("fused: dispatch(dev img) + block R",
       lambda: dispatch(img_j).R.block_until_ready())


def full(im=frames[-1]):
    out = dispatch(jnp.asarray(im))
    return jax.device_get(
        (out.R, out.t, out.kp_mp, out.n_match_motion, out.n_inl_motion,
         out.n_inl_final, out.lm_searched, out.xy_un, out.feats.octave,
         out.feats.angle, out.feats.desc, out.feats.valid))


timeit("fused: upload+dispatch+full fetch", full)


def small(im=frames[-1]):
    out = dispatch(jnp.asarray(im))
    return jax.device_get(
        (out.R, out.t, out.n_match_motion, out.n_inl_motion,
         out.n_inl_final))


timeit("fused: upload+dispatch+small fetch", small)

# pipelined: dispatch N+1 before fetching N
outs = [dispatch(img_j), None]


def pipelined(im=frames[-1]):
    nxt = dispatch(jnp.asarray(im))
    prev = outs[0]
    got = jax.device_get(
        (prev.R, prev.t, prev.kp_mp, prev.n_match_motion,
         prev.n_inl_motion, prev.n_inl_final, prev.lm_searched,
         prev.xy_un, prev.feats.octave, prev.feats.angle, prev.feats.desc,
         prev.feats.valid))
    outs[0] = nxt
    return got


timeit("fused pipelined: dispatch N+1, fetch N", pipelined)

# separate device compute from sync: queue K dispatches, block once
def depth(k):
    outs = [dispatch(img_j) for _ in range(k)]
    outs[-1].R.block_until_ready()

timeit("fused x1 + 1 block", lambda: depth(1), n=10)
timeit("fused x4 + 1 block", lambda: depth(4), n=10)
timeit("fused x8 + 1 block", lambda: depth(8), n=5)

# extractor alone
ext = step.extractor
ext_fn = jax.jit(lambda im: ext._extract(im, step.capacity))
timeit("extract only + block", lambda: ext_fn(img_j).xy.block_until_ready(), n=10)
