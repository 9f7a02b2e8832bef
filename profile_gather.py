"""Micro-bench: strategies for gathering (K, P, P) patches at keypoint
locations on TPU — the BRIEF/IC_Angle hot op."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

N_LONG = 32
H, W = 678, 518   # level-0 bordered
K = 256
P = 37


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def timed_scan(step, args, length=N_LONG):
    @jax.jit
    def run(seed, *a):
        def body(c, _):
            return step(c, *a), None
        acc, _ = jax.lax.scan(body, seed, None, length=length)
        return acc

    @jax.jit
    def tiny(seed):
        return seed + 1.0

    float(run(jnp.float32(0.0), *args))
    float(tiny(jnp.float32(0.0)))
    t0 = min(_t(lambda: float(tiny(jnp.float32(s)))) for s in (1.0, 2.0))
    tN = min(_t(lambda: float(run(jnp.float32(s), *args))) for s in (3.0, 4.0))
    return max(tN - t0, 0.0) / length


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    y0 = jnp.asarray(rng.integers(0, H - P, K).astype(np.int32))
    x0 = jnp.asarray(rng.integers(0, W - P, K).astype(np.int32))

    def checksum(p):
        return p.astype(jnp.float32).sum() * 1e-9

    # 1. vmapped dynamic_slice (current)
    def m1(seed, img, y0, x0):
        def one(yy, xx):
            return jax.lax.dynamic_slice(img, (yy, xx), (P, P))
        p = jax.vmap(one)(y0 + (seed.astype(jnp.int32) & 1), x0)
        return seed + checksum(p)

    # 2. flat scalar gather with broadcast index arithmetic
    def m2(seed, img, y0, x0):
        dv = jnp.arange(P, dtype=jnp.int32)
        idx = ((y0[:, None] + dv[None, :])[:, :, None] * W
               + (x0[:, None] + dv[None, :])[:, None, :])
        p = img.reshape(-1)[idx.reshape(K, -1) + (seed.astype(jnp.int32) & 1)]
        return seed + checksum(p)

    # 3. row gather (fancy index rows), then per-row dynamic slice via take
    def m3(seed, img, y0, x0):
        dv = jnp.arange(P, dtype=jnp.int32)
        rows = img[(y0[:, None] + dv[None, :]).reshape(-1)]  # (K*P, W)
        cols = (x0[:, None, None] + dv[None, None, :])       # (K,1,P)
        cols = jnp.broadcast_to(cols, (K, P, P)).reshape(K * P, P)
        p = jnp.take_along_axis(rows, cols + (seed.astype(jnp.int32) & 1), axis=1)
        return seed + checksum(p)

    # 4. one-hot matmul rows + batched one-hot cols (MXU)
    def m4(seed, img, y0, x0):
        dv = jnp.arange(P, dtype=jnp.int32)
        ry = (y0[:, None] + dv[None, :]).reshape(-1)          # (K*P,)
        oh_r = (ry[:, None] == jnp.arange(H)[None, :]).astype(jnp.bfloat16)
        rows = jnp.dot(oh_r, img.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)    # (K*P, W)
        cx = (x0[:, None] + dv[None, :])                      # (K, P)
        oh_c = (cx[:, :, None] == jnp.arange(W)[None, None, :]).astype(jnp.bfloat16)
        p = jnp.einsum("krw,kpw->krp", rows.reshape(K, P, W).astype(jnp.bfloat16),
                       oh_c, preferred_element_type=jnp.float32)
        return seed + p.sum() * 1e-9 + (seed - seed + (seed.astype(jnp.int32) & 1).astype(seed.dtype) * 0.001)

    # 5. dynamic_slice of row band then take_along_axis
    def m5(seed, img, y0, x0):
        def one(yy):
            return jax.lax.dynamic_slice(img, (yy, 0), (P, W))
        bands = jax.vmap(one)(y0 + (seed.astype(jnp.int32) & 1))  # (K, P, W)
        dv = jnp.arange(P, dtype=jnp.int32)
        cols = jnp.broadcast_to(
            (x0[:, None, None] + dv[None, None, :]), (K, P, P)
        )
        p = jnp.take_along_axis(bands, cols, axis=2)
        return seed + checksum(p)

    methods = {"m1": ("vmap dslice", m1), "m2": ("flat gather", m2),
               "m3": ("row gather", m3), "m4": ("onehot mxu", m4),
               "m5": ("band+take", m5)}
    want = sys.argv[1:] or list(methods)
    for name, fn in [methods[w] for w in want]:
        try:
            ms = 1e3 * timed_scan(fn, (img, y0, x0))
            print(f"{name:12s}: {ms:7.3f} ms")
        except Exception as e:
            print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
