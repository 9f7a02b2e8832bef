"""RECENTLY_LOST grace period (reference Tracking.cc:1576-1605) and
fisheye bearing-vector relocalization (MLPnPsolver semantics,
reference inc/MLPnPsolver.h:59-157)."""

import dataclasses

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from extractorb_tpu.config import (
    CameraConfig, ORBConfig, SLAMConfig, TrackingConfig,
)
from extractorb_tpu.core import lie
from extractorb_tpu.slam.system import System
from extractorb_tpu.slam.tracking import Frame, Tracker, TrackState

from test_slam_e2e import render_sequence, W, H
from test_loop_closing import make_features


@pytest.fixture(scope="module")
def scene(luna_gray):
    tex = cv2.resize(luna_gray, (1024, 1024))
    return render_sequence(tex, n_frames=38)


def run_occluded(scene, occluded, time_recently_lost=5.0):
    """Track the sequence with the given frame indices blacked out.
    max_frames=1 promotes (nearly) every frame so the map matures past
    the >10-keyframe RECENTLY_LOST gate before the occlusion."""
    frames, poses = scene
    cfg = SLAMConfig(
        orb=ORBConfig(n_features=1000),
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                            width=W, height=H),
        tracking=TrackingConfig(
            max_frames=1, time_recently_lost=time_recently_lost
        ),
    )
    sys_ = System(cfg)
    states = []
    black = np.zeros((H, W), np.uint8)
    for k, img in enumerate(frames):
        if k in occluded:
            img = black
        states.append(sys_.track_monocular(img, k / 30.0))
    return sys_, states


@pytest.mark.slow
def test_recently_lost_then_recover(scene):
    """A short occlusion on a mature map enters RECENTLY_LOST (not
    LOST) and relocalization recovers to OK within the grace window."""
    sys_, states = run_occluded(scene, occluded={30, 31})
    assert TrackState.RECENTLY_LOST in states[29:33], states
    # the 5 s grace covers the 2-frame blackout: never fully LOST
    assert TrackState.LOST not in states, states
    assert states[-1] == TrackState.OK, states


def _empty_frame(fid, ts, n_cap=512):
    return Frame(
        frame_id=fid, timestamp=ts,
        feats=make_features(np.zeros((0, 32), np.uint8),
                            np.zeros((0, 2), np.float32), n_cap)[0],
        xy_un=np.zeros((n_cap, 2), np.float32),
        octave=np.zeros(n_cap, np.int32),
        angle=np.zeros(n_cap, np.float32),
        desc=np.zeros((n_cap, 32), np.uint8),
        valid=np.zeros(n_cap, bool),
        kp_mp=np.full(n_cap, -1, np.int32),
    )


def test_enter_lost_gate():
    """Track failure drops to RECENTLY_LOST only on a mature map
    (reference Tracking.cc:1576-1605: >10 keyframes)."""
    cfg = SLAMConfig(camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0,
                                         cy=240.0, width=W, height=H))
    tr = Tracker(cfg)
    mp = tr.atlas.current
    mp.keyframes = {i: object() for i in range(3)}
    tr._enter_lost(1.0)
    assert tr.state == TrackState.LOST
    mp.keyframes = {i: object() for i in range(11)}
    tr._enter_lost(2.0)
    assert tr.state == TrackState.RECENTLY_LOST
    assert tr._lost_ts == 2.0


def test_recently_lost_timeout_to_lost():
    """Without relocalization the state holds RECENTLY_LOST through the
    grace window and then drops to LOST."""
    cfg = SLAMConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                            width=W, height=H),
        tracking=TrackingConfig(time_recently_lost=0.5),
    )
    tr = Tracker(cfg)
    tr.state = TrackState.RECENTLY_LOST
    tr._lost_ts = 0.0
    assert tr._track_recently_lost(_empty_frame(1, 0.3), 0.3) \
        == TrackState.RECENTLY_LOST
    assert tr._track_recently_lost(_empty_frame(2, 0.8), 0.8) \
        == TrackState.LOST


# ------------------------------------------------------ fisheye reloc


KB8_CAM = CameraConfig(
    model="KannalaBrandt8",
    fx=190.978, fy=190.973, cx=254.932, cy=256.897,
    k1=0.003482, k2=0.000715, k3=-0.002053, k4=0.000203,
    width=512, height=512,
)


def test_fisheye_relocalization_bearing_pnp(rng):
    """KB8 relocalization must unproject raw fisheye keypoints through
    the full theta-polynomial model before PnP (MLPnP semantics); a
    pinhole normalisation of raw KB8 pixels is geometrically wrong at
    wide angles and fails this scene."""
    cfg = SLAMConfig(
        orb=ORBConfig(n_features=500),
        camera=KB8_CAM,
        sensor="monocular",
    )
    tr = Tracker(cfg)
    cam = tr.kb8

    # wide-FOV scene: bearings up to ~55 deg off-axis, depths 2-8 m
    n = 240
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(0, np.deg2rad(55), n)
    bear = np.stack(
        [np.sin(el) * np.cos(az), np.sin(el) * np.sin(az), np.cos(el)], -1
    )
    depth = rng.uniform(2.0, 8.0, n)[:, None]
    pts = (bear * depth).astype(np.float32)
    desc = rng.integers(0, 256, (n, 32), dtype=np.uint8)

    mp = tr.atlas.current

    def observe(R, t):
        pc = pts @ R.T + t
        uv = np.asarray(cam.project(jnp.asarray(pc)))
        ok = (
            (pc[:, 2] > 0.1)
            & (uv[:, 0] > 8) & (uv[:, 0] < 504)
            & (uv[:, 1] > 8) & (uv[:, 1] < 504)
        )
        return uv, np.where(ok)[0]

    # keyframe at the origin observing everything
    R0 = np.eye(3, dtype=np.float32)
    t0 = np.zeros(3, np.float32)
    uv0, vis0 = observe(R0, t0)
    feats, xy_un, d_arr, v_arr = make_features(desc[vis0], uv0[vis0])
    from extractorb_tpu.slam.map import KeyFrame

    kf = KeyFrame(
        kid=-1, frame_id=0, timestamp=0.0, R=R0, t=t0,
        feats=feats, xy_un=xy_un,
        octave=np.zeros(512, np.int32), angle=np.zeros(512, np.float32),
        desc=d_arr, valid=v_arr, kp_mp=np.full(512, -1, np.int32),
    )
    mp.add_keyframe(kf)
    for row, p in enumerate(vis0):
        mid = mp.add_point(pts[p], desc[p], np.zeros(3), 10.0, kf.kid)
        mp.add_observation(mid, kf.kid, row)
        kf.kp_mp[row] = mid
    for p in range(mp._next_mp):
        mp.update_point_stats(p)

    # query frame from a genuinely different pose
    Rq = np.asarray(
        lie.so3_exp(jnp.asarray([0.06, -0.10, 0.04], jnp.float32))
    ).astype(np.float32)
    Cq = np.array([0.4, -0.25, 0.3], np.float32)
    tq = (-Rq @ Cq).astype(np.float32)
    uvq, visq = observe(Rq, tq)
    featsq, xy_q, d_q, v_q = make_features(desc[visq], uvq[visq])
    frame = Frame(
        frame_id=1, timestamp=1.0, feats=featsq, xy_un=xy_q,
        octave=np.zeros(512, np.int32), angle=np.zeros(512, np.float32),
        desc=d_q, valid=v_q, kp_mp=np.full(512, -1, np.int32),
    )

    tr.state = TrackState.LOST
    assert tr._relocalize(frame)
    np.testing.assert_allclose(frame.R, Rq, atol=2e-2)
    np.testing.assert_allclose(frame.t, tq, atol=5e-2)
