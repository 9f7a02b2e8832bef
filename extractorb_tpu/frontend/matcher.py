"""Descriptor matching on the MXU.

Replaces ORBmatcher's Hamming-distance searches (reference:
src/ORBmatcher.cc).  The 256-bit popcount distance (DescriptorDistance,
ORBmatcher.cc:2349-2366) becomes a bit-plane matmul:

    popcount(a XOR b) = sum(a) + sum(b) - 2 a.b      for bits a, b

so a whole (N1, N2) distance matrix is one (N1,256)x(256,N2) matmul —
exactly the XOR+popcount semantics, but at MXU speed.  The reference's
grid-window candidate gating, mutual-conflict stealing, NN-ratio test and
rotation-histogram filtering are reproduced as masks and scatter-max ops
over the dense matrix.

Constants TH_LOW=50, TH_HIGH=100, HISTO_LENGTH=30 (ORBmatcher.cc:36-38).
The reference's rotation histogram uses factor = 1/HISTO_LENGTH (a
well-known ORB-SLAM quirk: 30-degree-wide bins, only bins 0..12 used) —
reproduced bit-for-bit (ORBmatcher.cc:706+60).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

TH_LOW = 50
TH_HIGH = 100
HISTO_LENGTH = 30


@jax.jit
def unpack_bits(desc_u8: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) uint8 -> (N, 256) bit planes in bf16 (exact 0/1)."""
    n = desc_u8.shape[0]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_u8[:, :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(n, 256).astype(jnp.bfloat16)


@jax.jit
def hamming_matrix(desc1_u8: jnp.ndarray, desc2_u8: jnp.ndarray) -> jnp.ndarray:
    """(N1, N2) int32 Hamming distances between packed descriptors."""
    a = unpack_bits(desc1_u8)
    b = unpack_bits(desc2_u8)
    dots = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    sa = jnp.sum(a.astype(jnp.float32), axis=1)
    sb = jnp.sum(b.astype(jnp.float32), axis=1)
    return (sa[:, None] + sb[None, :] - 2.0 * dots).astype(jnp.int32)


def rotation_consistency_mask(angle1, angle2, cand_valid):
    """Reference rotation-histogram filter (ComputeThreeMaxima,
    ORBmatcher.cc:2303): returns per-candidate keep mask.

    angle1/angle2: (N1,) angles of kp1 and its matched kp2.
    cand_valid: (N1,) bool — entries that were entered into the histogram.
    """
    rot = angle1 - angle2
    rot = jnp.where(rot < 0, rot + 360.0, rot)
    factor = jnp.float32(1.0 / HISTO_LENGTH)  # reference quirk
    binf = jnp.rint(rot * factor).astype(jnp.int32)
    binf = jnp.where(binf == HISTO_LENGTH, 0, binf)
    binf = jnp.clip(binf, 0, HISTO_LENGTH - 1)
    hist = jnp.zeros((HISTO_LENGTH,), jnp.int32).at[binf].add(
        cand_valid.astype(jnp.int32)
    )
    top3 = jax.lax.top_k(hist, 3)
    max1, max2, max3 = top3[0][0], top3[0][1], top3[0][2]
    i1, i2, i3 = top3[1][0], top3[1][1], top3[1][2]
    # reference drops bin2/bin3 when much weaker than bin1
    keep2 = max2.astype(jnp.float32) >= 0.1 * max1.astype(jnp.float32)
    keep3 = max3.astype(jnp.float32) >= 0.1 * max1.astype(jnp.float32)
    ok = (binf == i1) | (keep2 & (binf == i2)) | (keep3 & (binf == i3))
    return ok & cand_valid


@functools.partial(jax.jit, static_argnums=(10,))
def search_for_initialization(
    desc1, xy1, angle1, octave1, valid1,
    desc2, xy2, angle2, octave2, valid2,
    window: int = 100,
    prev_matched=None,
    nn_ratio: float = 0.9,
):
    """ORBmatcher::SearchForInitialization (reference ORBmatcher.cc:706-822).

    Level-0 keypoints of frame1 search a +-window box (around
    prev_matched, default their own position) in frame2's level-0
    keypoints; best/second-best with NN ratio, TH_LOW gate, sequential
    conflict stealing (later i1 wins), rotation histogram top-3 filter.

    Returns (matches12 (N1,) int32 index into frame2 or -1).
    """
    if prev_matched is None:
        prev_matched = xy1

    dist = hamming_matrix(desc1, desc2)  # (N1, N2)

    dx = jnp.abs(prev_matched[:, 0:1] - xy2[None, :, 0])
    dy = jnp.abs(prev_matched[:, 1:2] - xy2[None, :, 1])
    in_window = (dx < window) & (dy < window)
    ok2 = valid2 & (octave2 == 0)
    ok1 = valid1 & (octave1 == 0)
    mask = in_window & ok2[None, :] & ok1[:, None]

    INF = jnp.int32(1 << 20)
    d = jnp.where(mask, dist, INF)
    best = jnp.min(d, axis=1)
    best_idx = jnp.argmin(d, axis=1)
    # second best: mask out the best column per row
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(INF)
    second = jnp.min(d2, axis=1)

    accept = (
        (best <= TH_LOW)
        & (best.astype(jnp.float32) < nn_ratio * second.astype(jnp.float32))
        & ok1
    )

    # Conflict resolution.  The reference processes i1 sequentially with
    # vMatchedDistance gating (a later i1 steals kp2 only with a strictly
    # smaller distance), so the final owner of a kp2 is the minimum-dist
    # claimant (ties keep the earlier i1).  We reproduce that fixed point
    # directly with a scatter-min; the one sequential effect not modelled
    # is vMatchedDistance's influence on later rows' second-best values.
    n1, n2 = d.shape
    i1 = jnp.arange(n1, dtype=jnp.int32)
    claim_key = best * n1 + i1  # dist-major, earlier-i1 tiebreak
    INF_KEY = jnp.int32(2**31 - 1)
    winner = jnp.full((n2,), INF_KEY, jnp.int32).at[
        jnp.where(accept, best_idx, n2)
    ].min(jnp.where(accept, claim_key, INF_KEY), mode="drop")
    final = accept & (winner[best_idx] == claim_key)

    # rotation histogram built from ALL accepted-at-some-point entries
    # (stale stolen entries included, like the reference)
    a2 = angle2[best_idx]
    rot_ok = rotation_consistency_mask(angle1, a2, accept)
    final = final & rot_ok

    return jnp.where(final, best_idx, -1)


@jax.jit
def mutual_best_match(desc1, valid1, desc2, valid2, max_dist: int = TH_LOW):
    """Simple mutual-nearest matcher (the demos' BFMatcher oracle analog,
    main_matcher.cpp:243-250): used for tests and generic two-view ops."""
    dist = hamming_matrix(desc1, desc2)
    INF = jnp.int32(1 << 20)
    d = jnp.where(valid1[:, None] & valid2[None, :], dist, INF)
    best12 = jnp.argmin(d, axis=1)
    best21 = jnp.argmin(d, axis=0)
    i1 = jnp.arange(d.shape[0], dtype=jnp.int32)
    mutual = best21[best12] == i1
    dmin = jnp.min(d, axis=1)
    ok = mutual & (dmin <= max_dist) & valid1
    return jnp.where(ok, best12, -1), dmin
