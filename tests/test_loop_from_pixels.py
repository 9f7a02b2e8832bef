"""End-to-end loop closure from pixels (BASELINE config 4 stand-in):
an out-and-back camera path over the synthetic two-plane scene, driven
through the full System with a trained vocabulary; the loop closer must
detect the revisit and correct the map (reference flow:
src/LoopClosing.cc:56-248)."""

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from extractorb_tpu.config import (
    CameraConfig, ORBConfig, SLAMConfig, TrackingConfig,
)
from extractorb_tpu.core import lie
from extractorb_tpu.frontend.extractor import ORBExtractor
from extractorb_tpu.place.vocab import Vocabulary
from extractorb_tpu.slam.system import System
from extractorb_tpu.slam.tracking import TrackState

from test_slam_e2e import render_sequence, umeyama_align, W, H

K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float64)


def render_loop_sequence(tex, n_frames=28):
    """Same two-plane scene as render_sequence, but the camera goes OUT
    for half the frames and comes BACK over the same viewpoints, so the
    tail revisits the head."""
    half = n_frames // 2
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
        j = k if k < half else (n_frames - 1 - k)
        ang = 0.015 * j
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, ang, 0.0])))
        C = np.array([0.12 * j, 0.015 * j, 0.01 * j])
        t = -R @ C
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
        img = np.where(mask > 128, near, img)
        frames.append(img)
        poses.append((R, t))
    return frames, poses


@pytest.mark.slow
def test_loop_closure_from_pixels(luna_gray):
    tex = cv2.resize(luna_gray, (1024, 1024))
    frames, poses = render_loop_sequence(tex, n_frames=28)

    # vocabulary trained on the sequence's own ORB descriptors
    ext = ORBExtractor(ORBConfig(n_features=1000), octree="device")
    descs = []
    for img in frames[::5]:
        f = ext(jnp.asarray(img))
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = Vocabulary.train(np.concatenate(descs, 0), k=8, L=3, seed=0)

    cfg = SLAMConfig(
        orb=ORBConfig(n_features=1000),
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                            width=W, height=H),
        tracking=TrackingConfig(max_frames=2),
    )
    sys_ = System(cfg, vocab=vocab)
    states = [sys_.track_monocular(im, k / 30.0)
              for k, im in enumerate(frames)]
    assert TrackState.LOST not in states, states
    assert states[-1] == TrackState.OK, states

    lc = sys_.tracker.loop_closer
    assert lc.n_loops + lc.n_merges >= 1, (lc.n_loops, lc.n_merges)

    # trajectory quality after correction: Sim3-aligned ATE of the
    # composed (corrected) trajectory must be small and no worse than
    # the raw uncorrected one
    def ate(traj):
        est = np.array([-R.T @ t for _, R, t in traj])
        gt = np.array([
            -poses[int(round(ts * 30.0))][0].T
            @ poses[int(round(ts * 30.0))][1]
            for ts, _, _ in traj
        ])
        aligned = umeyama_align(est, gt)
        return float(np.sqrt(((aligned - gt) ** 2).sum(-1).mean()))

    ate_raw = ate(sys_.tracker.trajectory)
    ate_final = ate(sys_.tracker.final_trajectory())
    assert ate_final < max(0.06, ate_raw * 1.05), (ate_final, ate_raw)
