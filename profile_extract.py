"""Fine-grained device timing of the extractor's sub-stages, isolated
with realistic fixed inputs (scan method like profile_stages.py).

Stages per level: FAST detect, collect (mask->list), device octree,
compact, IC_Angle, blur, BRIEF; plus the final truncate merge.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from extractorb_tpu.config import ORBConfig
from extractorb_tpu.frontend import blur as fblur
from extractorb_tpu.frontend import brief as fbrief
from extractorb_tpu.frontend import fast as ffast
from extractorb_tpu.frontend import octree as foctree
from extractorb_tpu.frontend import orientation as forient
from extractorb_tpu.frontend import extractor as fex
from extractorb_tpu.frontend.pyramid import EDGE_THRESHOLD, compute_pyramid

N_LONG = 32


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def timed_scan(step, init_args, length=N_LONG):
    @jax.jit
    def run(seed, *args):
        def body(carry, _):
            return step(carry, *args), None

        acc, _ = jax.lax.scan(body, seed, None, length=length)
        return acc

    @jax.jit
    def tiny(seed):
        return seed + 1.0

    float(run(jnp.float32(0.0), *init_args))
    float(tiny(jnp.float32(0.0)))
    t0 = min(_t(lambda: float(tiny(jnp.float32(s)))) for s in (1.0, 2.0, 3.0))
    tN = min(
        _t(lambda: float(run(jnp.float32(s), *init_args))) for s in (4.0, 5.0, 6.0)
    )
    return max(tN - t0, 0.0) / length


def main():
    try:
        import cv2

        img = cv2.imread("/root/reference/pic/robot/865_im.jpg", 0)
        assert img is not None
    except Exception:
        img = np.random.default_rng(0).integers(0, 256, (480, 640), np.uint8)
    img_j = jnp.asarray(img)
    cfg = ORBConfig(n_features=1000)
    ext = fex.ORBExtractor(cfg, octree="device")

    pyr = compute_pyramid(img_j, cfg.n_levels, cfg.scale_factor)
    # precompute realistic per-level inputs
    levels = []
    for lvl in range(cfg.n_levels):
        bordered = pyr[lvl]
        keep, score = ffast.detect_keypoints(bordered, 20, 7)
        xy_all, resp_all, valid_all = ffast.collect_keypoints(
            keep, score, cfg.max_kps_per_level
        )
        budget = ext.budgets[lvl]
        cap_l = min(cfg.max_kps_per_level, budget + 16)
        h, w = bordered.shape
        H, W = h - 2 * EDGE_THRESHOLD, w - 2 * EDGE_THRESHOLD
        min_b = ffast.MIN_BORDER
        sel, _ = foctree.distribute_device(
            xy_all, resp_all, valid_all, budget,
            W - 2 * min_b, H - 2 * min_b, min_b, min_b,
        )
        xy, resp, valid = fex._compact(xy_all, resp_all, valid_all & sel, cap_l)
        angles = forient.ic_angle(bordered, xy, valid)
        levels.append(dict(
            bordered=bordered, keep=keep, score=score,
            xy_all=xy_all, resp_all=resp_all, valid_all=valid_all,
            budget=budget, cap_l=cap_l, W=W, H=H, min_b=min_b,
            xy=xy, resp=resp, valid=valid, angles=angles,
            blurred=fblur.blur_level(bordered),
        ))

    def report(name, step, args):
        print(f"{name:14s}: {1e3 * timed_scan(step, args):7.3f} ms")

    def s_collect(seed, *a):
        acc = seed
        for i, L in enumerate(levels):
            xy, r, v = ffast.collect_keypoints(
                L["keep"] & (seed > -1e9), L["score"], cfg.max_kps_per_level
            )
            acc += r.sum() * 1e-9 + xy.sum() * 1e-9
        return acc

    def s_octree(seed, *a):
        acc = seed
        for L in levels:
            sel, _ = foctree.distribute_device(
                L["xy_all"], L["resp_all"] + (seed - seed + (seed.astype(jnp.int32) & 1).astype(seed.dtype) * 0.001), L["valid_all"],
                L["budget"], L["W"] - 2 * L["min_b"], L["H"] - 2 * L["min_b"],
                L["min_b"], L["min_b"],
            )
            acc += sel.sum() * 1e-9
        return acc

    def s_compact(seed, *a):
        acc = seed
        for L in levels:
            xy, r, v = fex._compact(
                L["xy_all"], L["resp_all"] + (seed - seed + (seed.astype(jnp.int32) & 1).astype(seed.dtype) * 0.001), L["valid_all"], L["cap_l"]
            )
            acc += r.sum() * 1e-9
        return acc

    def s_angle(seed, *a):
        acc = seed
        for L in levels:
            ang = forient.ic_angle(L["bordered"], L["xy"], L["valid"] & (seed > -1e9))
            acc += ang.sum() * 1e-9
        return acc

    def s_blur(seed, *a):
        acc = seed
        for L in levels:
            bl = fblur.blur_level(L["bordered"] + (seed.astype(jnp.uint8) & 1))
            acc += bl[::64, ::64].astype(jnp.float32).sum() * 1e-9
        return acc

    def s_brief(seed, *a):
        acc = seed
        for L in levels:
            bits = fbrief.compute_descriptors(
                L["blurred"], L["xy"], L["angles"] + (seed - seed + (seed.astype(jnp.int32) & 1).astype(seed.dtype) * 0.001), L["valid"]
            )
            desc = fbrief.pack_bits_u8(bits)
            acc += desc.astype(jnp.float32).sum() * 1e-9
        return acc

    report("collect x8", s_collect, ())
    report("octree  x8", s_octree, ())
    report("compact x8", s_compact, ())
    report("ic_angle x8", s_angle, ())
    report("blur    x8", s_blur, ())
    report("brief   x8", s_brief, ())


if __name__ == "__main__":
    main()
