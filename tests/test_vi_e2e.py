"""Visual-inertial monocular e2e through the full System: rendered
frames + analytically consistent IMU samples; the staged IMU
initialisation (reference LocalMapping.cc:162-219) must fire and
recover METRIC scale (monocular-visual-only cannot).  Also covers
checkpoint/resume of an inertial session mid-sequence."""

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from extractorb_tpu.config import (
    CameraConfig, IMUConfig, ORBConfig, SLAMConfig, TrackingConfig,
)
from extractorb_tpu.core import lie
from extractorb_tpu.slam import checkpoint as ckpt
from extractorb_tpu.slam.system import System
from extractorb_tpu.slam.tracking import TrackState

from test_slam_e2e import W, H, umeyama_align

K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float64)
G_W = np.array([0.0, -9.81, 0.0])
FPS = 10.0          # frame spacing 0.1 s -> 4 s sequence in 40 frames
IMU_HZ = 100.0


AMP = np.array([0.70, 0.25, 0.12])
OM = np.array([1.9, 1.4, 1.1])
PH = np.array([0.0, 1.0, 0.5])


def _pose(t):
    """Analytic camera trajectory with rich acceleration: monocular-
    inertial scale observability needs the accelerometer signal to
    dominate the visual pose noise (the scale estimate of a fixed-pose
    inertial-only solve shrinks toward zero otherwise)."""
    ang = 0.10 * np.sin(0.9 * t)
    C = AMP * np.sin(OM * t + PH) - AMP * np.sin(PH)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.0, ang, 0.0]))).astype(
        np.float64
    )
    return R, (-R @ C)


def _accel(t):
    return -AMP * OM ** 2 * np.sin(OM * t + PH)


def _vel(t):
    return AMP * OM * np.cos(OM * t + PH)


def _gyro(t):
    # R_wb = exp(-ang(t) y_hat): omega_b = -ang'(t) * y
    return np.array([0.0, -0.10 * 0.9 * np.cos(0.9 * t), 0.0])


def _imu_window(t0, t1):
    """(t, acc, gyro) samples in [t0, t1] at IMU_HZ (body == camera).
    The boundary sample at t0 is included so the preintegration's first
    clipped interval is covered (duplicates across windows collapse to
    zero-length intervals in the queue)."""
    out = []
    n = int(round((t1 - t0) * IMU_HZ))
    for i in range(0, n + 1):
        t = t0 + i / IMU_HZ
        R, _ = _pose(t)
        acc = R @ (_accel(t) - G_W)
        out.append((t, acc.astype(np.float32),
                    _gyro(t).astype(np.float32)))
    return out


def render_vi_sequence(tex, n_frames=40):
    s_far = 5.0 / tex.shape[0]
    A_far = np.array(
        [[s_far, 0, -2.5], [0, s_far, -2.5], [0, 0, 5.0]], np.float64
    )
    tex_near = cv2.flip(tex, 1)
    s_near = 1.6 / tex.shape[0]
    A_near = np.array(
        [[s_near, 0, -1.1], [0, s_near, -0.8], [0, 0, 3.0]], np.float64
    )
    ones = np.full_like(tex, 255)
    e3 = np.array([[0.0, 0.0, 1.0]])
    frames, poses = [], []
    for k in range(n_frames):
        R, t = _pose(k / FPS)
        img = cv2.warpPerspective(
            tex, K @ (R @ A_far + t[:, None] @ e3), (W, H),
            flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE,
        )
        near = cv2.warpPerspective(
            tex_near, K @ (R @ A_near + t[:, None] @ e3), (W, H),
            flags=cv2.INTER_LINEAR,
        )
        mask = cv2.warpPerspective(
            ones, K @ (R @ A_near + t[:, None] @ e3), (W, H),
            flags=cv2.INTER_NEAREST,
        )
        frames.append(np.where(mask > 128, near, img))
        poses.append((R, t))
    return frames, poses


def _vi_cfg():
    return SLAMConfig(
        orb=ORBConfig(n_features=1000),
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                            width=W, height=H, fps=FPS),
        imu=IMUConfig(noise_gyro=1e-4, noise_acc=1e-3,
                      gyro_walk=1e-6, acc_walk=1e-5,
                      frequency=IMU_HZ),
        tracking=TrackingConfig(max_frames=3),
        sensor="imu-monocular",
    )


@pytest.fixture(scope="module")
def vi_scene(luna_gray):
    tex = cv2.resize(luna_gray, (1024, 1024))
    return render_vi_sequence(tex, n_frames=40)


@pytest.mark.slow
def test_vi_mono_e2e_metric_scale(vi_scene):
    frames, poses = vi_scene
    sys_ = System(_vi_cfg())
    states = []
    for k, img in enumerate(frames):
        ts = k / FPS
        imu = _imu_window((k - 1) / FPS, ts) if k else None
        states.append(sys_.track_monocular(img, ts, imu=imu))
    assert states[-1] == TrackState.OK, states
    # brief losses with recovery are acceptable; a terminal LOST is not
    assert all(s == TrackState.OK for s in states[-4:]), states
    mp = sys_.tracker.atlas.current
    assert mp.imu_initialized, "IMU init stage never fired"

    traj = sys_.tracker.final_trajectory()
    est = np.array([-R.T @ t for _, R, t in traj])
    gt = np.array([
        -_pose(ts)[0].T @ _pose(ts)[1] for ts, _, _ in traj
    ])
    # similarity alignment: after VI init the recovered scale must be
    # metric (|s - 1| small); visual-only mono has arbitrary scale
    aligned, s = umeyama_align(est, gt, return_scale=True)
    ate = float(np.sqrt(((aligned - gt) ** 2).sum(-1).mean()))
    # visual-only mono is arbitrary-scale; a recovered metric scale
    # within 35% demonstrates the inertial init actually fired and
    # resolved it (the staged VIBA refinements tighten it further)
    assert abs(s - 1.0) < 0.35, s
    assert ate < 0.25, ate


@pytest.mark.slow
def test_vi_session_resume(vi_scene, tmp_path):
    """Stop an inertial session mid-sequence, reload, keep tracking —
    the IMU queue, bias, preintegration chain and velocities must all
    survive the round trip (reference KeyFrame.h:56-146 surface)."""
    frames, poses = vi_scene
    cfg = _vi_cfg()
    sys_ = System(cfg)
    cut = 30
    for k in range(cut):
        ts = k / FPS
        imu = _imu_window((k - 1) / FPS, ts) if k else None
        sys_.track_monocular(frames[k], ts, imu=imu)
    assert sys_.state == TrackState.OK

    path = str(tmp_path / "vi_session.npz")
    ckpt.save_session(sys_.tracker, path)
    tr2 = ckpt.load_session(path, cfg)
    assert tr2.inertial and tr2.imu_queue is not None
    assert tr2.atlas.current.imu_initialized \
        == sys_.tracker.atlas.current.imu_initialized

    states = []
    for k in range(cut, len(frames)):
        ts = k / FPS
        states.append(tr2.track(frames[k], ts,
                                imu=_imu_window((k - 1) / FPS, ts)))
    assert all(s == TrackState.OK for s in states), states


@pytest.mark.slow
def test_vi_fused_pipelined_engages(vi_scene):
    """After gravity/scale resolve, inertial tracking must ride the
    fused one-program path (IMU prediction + in-program joint
    pose-inertial optimization with the prior chain) with pipelined
    confirmation — and keep metric scale."""
    frames, poses = vi_scene
    base = _vi_cfg()
    cfg = SLAMConfig(
        orb=base.orb, camera=base.camera, imu=base.imu,
        tracking=TrackingConfig(max_frames=3, pipeline_depth=3),
        sensor="imu-monocular",
    )
    sys_ = System(cfg)
    states = []
    for k, img in enumerate(frames):
        ts = k / FPS
        imu = _imu_window((k - 1) / FPS, ts) if k else None
        states.append(sys_.track_monocular(img, ts, imu=imu))
    sys_.flush()
    assert states[-1] == TrackState.OK, states
    mp = sys_.tracker.atlas.current
    assert mp.imu_initialized
    # the fused VI path must have processed a meaningful share of the
    # post-init frames
    assert sys_.tracker.n_fused_frames >= 8, sys_.tracker.n_fused_frames

    traj = sys_.tracker.final_trajectory()
    est = np.array([-R.T @ t for _, R, t in traj])
    gt = np.array([
        -_pose(ts)[0].T @ _pose(ts)[1] for ts, _, _ in traj
    ])
    aligned, s = umeyama_align(est, gt, return_scale=True)
    ate = float(np.sqrt(((aligned - gt) ** 2).sum(-1).mean()))
    assert abs(s - 1.0) < 0.35, s
    assert ate < 0.25, ate
