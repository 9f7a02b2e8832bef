"""Per-stage device timing of the frame hot path (scan method, like
bench.py): extraction total, then each extractor stage, matching, pose
opt.  Run on the live backend (TPU under axon)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from extractorb_tpu.config import ORBConfig
from extractorb_tpu.frontend import matcher as fm
from extractorb_tpu.frontend import fast as ffast
from extractorb_tpu.frontend.extractor import ORBExtractor
from extractorb_tpu.frontend.pyramid import compute_pyramid
from extractorb_tpu.solver import pose_opt as spo

N_LONG = 32


def timed_scan(step, init_args, length=N_LONG):
    """Time `step` executed `length` times inside one lax.scan program."""

    @jax.jit
    def run(seed, *args):
        def body(carry, _):
            acc = step(carry, *args)
            return acc, None

        acc, _ = jax.lax.scan(body, seed, None, length=length)
        return acc

    @jax.jit
    def tiny(seed):
        return seed + 1.0

    float(run(jnp.float32(0.0), *init_args))
    float(tiny(jnp.float32(0.0)))
    t0 = min(
        _t(lambda: float(tiny(jnp.float32(s)))) for s in (1.0, 2.0, 3.0)
    )
    tN = min(
        _t(lambda: float(run(jnp.float32(s), *init_args)))
        for s in (4.0, 5.0, 6.0)
    )
    return max(tN - t0, 0.0) / length


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    try:
        import cv2

        img = cv2.imread("/root/reference/pic/robot/865_im.jpg", 0)
        assert img is not None
    except Exception:
        img = np.random.default_rng(0).integers(0, 256, (480, 640), np.uint8)
    img_j = jnp.asarray(img)
    cfg = ORBConfig(n_features=1000)
    ext = ORBExtractor(cfg, octree="device")
    feats = ext(img_j)

    def vary(seed):
        return jnp.roll(img_j, seed.astype(jnp.int32) % 11, axis=0)

    # full extraction
    def step_extract(seed):
        f = ext(vary(seed))
        return seed + f.response.sum() * 1e-9 + f.xy.sum() * 1e-9

    print("extract total : %.3f ms" % (1e3 * timed_scan(step_extract, ())))

    # pyramid only
    def step_pyr(seed):
        pyr = compute_pyramid(vary(seed), cfg.n_levels, cfg.scale_factor)
        return seed + sum(p.astype(jnp.float32)[::64, ::64].sum() for p in pyr) * 1e-9

    print("pyramid       : %.3f ms" % (1e3 * timed_scan(step_pyr, ())))

    # pyramid + FAST detect (all levels)
    pyr0 = compute_pyramid(img_j, cfg.n_levels, cfg.scale_factor)

    def step_fast(seed):
        acc = seed
        pyr = compute_pyramid(vary(seed), cfg.n_levels, cfg.scale_factor)
        for lvl in range(cfg.n_levels):
            keep, score = ffast.detect_keypoints(pyr[lvl], 20, 7)
            acc = acc + keep.sum().astype(jnp.float32) * 1e-9
        return acc

    print("pyr+FAST      : %.3f ms" % (1e3 * timed_scan(step_fast, ())))

    # matching
    def step_match(seed):
        m = fm.search_for_initialization(
            feats.desc, feats.xy, feats.angle, feats.octave, feats.valid,
            feats.desc, feats.xy, feats.angle, feats.octave,
            feats.valid & (seed > -1.0),
        )
        return seed + (m >= 0).sum().astype(jnp.float32) * 1e-9

    print("match         : %.3f ms" % (1e3 * timed_scan(step_match, ())))

    # pose opt
    rng = np.random.default_rng(1)
    N = 2048
    pts = np.stack(
        [rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N), rng.uniform(3, 8, N)],
        -1,
    ).astype(np.float32)
    uv = np.stack(
        [500 * pts[:, 0] / pts[:, 2] + 320, 500 * pts[:, 1] / pts[:, 2] + 240],
        -1,
    ).astype(np.float32)

    def project(pc):
        return jnp.stack(
            [500.0 * pc[0] / pc[2] + 320.0, 500.0 * pc[1] / pc[2] + 240.0], -1
        ).reshape(2)

    pts_j, uv_j = jnp.asarray(pts), jnp.asarray(uv)
    ones, mask = jnp.ones(N, jnp.float32), jnp.ones(N, bool)
    eye, zero3 = jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)

    def step_pose(seed):
        r = spo.optimize_pose(eye, zero3 + seed * 1e-9, pts_j, uv_j, ones, mask, project)
        return seed + r.t[0] * 1e-9

    print("pose opt      : %.3f ms" % (1e3 * timed_scan(step_pose, ())))


if __name__ == "__main__":
    main()
