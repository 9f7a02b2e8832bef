"""Benchmark: frames/s per chip for the per-frame hot path
(extract + match + motion-only BA) on 640x480 frames.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); ORB-SLAM3's
paper-reported desktop-CPU tracking rate of ~30 frames/s is used as the
yardstick, so vs_baseline = our_fps / 30.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 30.0


def main():
    import jax
    import jax.numpy as jnp

    from extractorb_tpu.config import ORBConfig
    from extractorb_tpu.frontend import matcher as fm
    from extractorb_tpu.frontend.extractor import ORBExtractor
    from extractorb_tpu.solver import pose_opt as spo

    # ------------------------------------------------------------ frames
    try:
        import cv2

        base = cv2.imread("/root/reference/pic/robot/865_im.jpg", 0)
        frames = [
            cv2.imread(f"/root/reference/pic/robot/{n}_im.jpg", 0)
            for n in (865, 866, 867, 868)
        ]
        frames = [f for f in frames if f is not None]
    except Exception:
        frames = []
    if not frames:
        rng = np.random.default_rng(0)
        frames = [
            rng.integers(0, 256, (480, 640), dtype=np.uint8) for _ in range(4)
        ]
    frames = [jnp.asarray(f) for f in frames]

    cfg = ORBConfig(n_features=1000)
    ext = ORBExtractor(cfg, octree="device")

    fx, fy, cx, cy = 500.0, 500.0, 320.0, 240.0

    def project(pc):
        return jnp.stack(
            [fx * pc[0] / pc[2] + cx, fy * pc[1] / pc[2] + cy], -1
        ).reshape(2)

    N = 2048
    rng = np.random.default_rng(1)
    pts = np.stack(
        [rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N), rng.uniform(3, 8, N)],
        -1,
    ).astype(np.float32)
    uvs = np.stack(
        [fx * pts[:, 0] / pts[:, 2] + cx, fy * pts[:, 1] / pts[:, 2] + cy], -1
    ).astype(np.float32)
    pts_j = jnp.asarray(pts)
    uv_j = jnp.asarray(uvs)
    ones = jnp.ones(N, jnp.float32)
    mask = jnp.ones(N, bool)
    eye = jnp.eye(3, dtype=jnp.float32)
    zero3 = jnp.zeros(3, jnp.float32)

    @jax.jit
    def frame_step(img, prev_feats):
        """Per-frame cost: extract current frame, match against the
        previous frame's (cached) features, motion-only BA."""
        f = ext(img)
        matches = fm.search_for_initialization(
            f.desc, f.xy, f.angle, f.octave, f.valid,
            prev_feats.desc, prev_feats.xy, prev_feats.angle,
            prev_feats.octave, prev_feats.valid,
        )
        pose = spo.optimize_pose(eye, zero3, pts_j, uv_j, ones, mask, project)
        return f, matches, pose.R, pose.t, pose.n_inliers

    # warm-up / compile
    prev = ext(frames[0])
    out = frame_step(frames[1], prev)
    jax.block_until_ready(out)
    prev = out[0]

    n_iter = 20
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = frame_step(frames[i % len(frames)], prev)
        prev = out[0]
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iter / dt

    print(
        json.dumps(
            {
                "metric": "frames/s/chip (extract+match+pose-BA, 640x480, 1000 kps)",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
