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


def _first_claim(best_idx, accept, n_kp):
    """First-come conflict resolution: the smallest map-point index claims
    a keypoint (the reference skips already-assigned keypoints, so earlier
    map points win; ORBmatcher.cc:2028 region)."""
    M = best_idx.shape[0]
    mp_i = jnp.arange(M, dtype=jnp.int32)
    winner = jnp.full((n_kp,), M, jnp.int32).at[
        jnp.where(accept, best_idx, n_kp)
    ].min(jnp.where(accept, mp_i, M), mode="drop")
    return accept & (winner[best_idx] == mp_i)


@functools.partial(jax.jit, static_argnums=(12, 13, 14))
def search_by_projection_last_frame(
    mp_pos, mp_desc, mp_valid, mp_octave, mp_angle,
    R, t,
    kp_xy, kp_desc, kp_octave, kp_angle, kp_valid_and_free,
    project, scale_factors, img_wh,
    th: float = 15.0,
):
    """SearchByProjection, track-with-motion-model variant (reference
    ORBmatcher.cc:2028 region): project the last frame's map points with
    the predicted pose, search a th*scale[lastOctave] window in levels
    [lastOct-1, lastOct+1], keep best <= TH_HIGH, rotation-histogram
    filter, first-come conflict resolution.

    Returns matches (M,) int32: keypoint index per map point or -1.
    """
    M = mp_pos.shape[0]
    N = kp_xy.shape[0]
    scales = jnp.asarray(scale_factors, jnp.float32)

    pc = jnp.einsum("ij,mj->mi", R, mp_pos) + t[None]
    z_ok = pc[:, 2] > 0
    uv = jax.vmap(project)(pc)
    in_img = (
        (uv[:, 0] >= 0) & (uv[:, 0] < img_wh[0])
        & (uv[:, 1] >= 0) & (uv[:, 1] < img_wh[1])
    )

    radius = th * scales[jnp.clip(mp_octave, 0, len(scale_factors) - 1)]
    dx = jnp.abs(uv[:, 0:1] - kp_xy[None, :, 0])
    dy = jnp.abs(uv[:, 1:2] - kp_xy[None, :, 1])
    in_win = (dx < radius[:, None]) & (dy < radius[:, None])
    lvl_ok = (kp_octave[None, :] >= (mp_octave - 1)[:, None]) & (
        kp_octave[None, :] <= (mp_octave + 1)[:, None]
    )
    row_ok = mp_valid & z_ok & in_img
    mask = in_win & lvl_ok & row_ok[:, None] & kp_valid_and_free[None, :]

    dist = hamming_matrix(mp_desc, kp_desc)
    INF = jnp.int32(1 << 20)
    d = jnp.where(mask, dist, INF)
    best = jnp.min(d, axis=1)
    best_idx = jnp.argmin(d, axis=1)
    accept = (best <= TH_HIGH) & row_ok

    final = _first_claim(best_idx, accept, N)
    rot_ok = rotation_consistency_mask(mp_angle, kp_angle[best_idx], accept)
    final = final & rot_ok
    return jnp.where(final, best_idx, -1)


@functools.partial(jax.jit, static_argnums=(12, 13, 14))
def search_by_projection_local_map(
    mp_pos, mp_desc, mp_valid, mp_normal, mp_max_dist,
    R, t,
    kp_xy, kp_desc, kp_octave, kp_valid_and_free, kp_taken_dist_gate,
    project, scale_factors, img_wh,
    th: float = 1.0,
    nn_ratio: float = 0.8,
):
    """SearchByProjection, track-local-map variant (reference
    ORBmatcher.cc:44-216): frustum check, viewing-cos radius (2.5 or 4.0),
    predicted scale from distance, levels [pred-1, pred], NN-ratio applied
    only when best and second-best are on the same level, TH_HIGH gate.

    Returns matches (M,) int32 keypoint index per map point or -1.
    """
    M = mp_pos.shape[0]
    N = kp_xy.shape[0]
    n_levels = len(scale_factors)
    scales = jnp.asarray(scale_factors, jnp.float32)
    log_scale = jnp.log(scales[1])

    pc = jnp.einsum("ij,mj->mi", R, mp_pos) + t[None]
    z_ok = pc[:, 2] > 0
    uv = jax.vmap(project)(pc)
    in_img = (
        (uv[:, 0] >= 0) & (uv[:, 0] < img_wh[0])
        & (uv[:, 1] >= 0) & (uv[:, 1] < img_wh[1])
    )

    # viewing direction check (isInFrustum: cos(normal, view) >= 0.5)
    Ow = -jnp.einsum("ji,j->i", R, t)  # camera centre in world
    view = mp_pos - Ow[None]
    dist3 = jnp.linalg.norm(view, axis=-1)
    view_cos = jnp.sum(view * mp_normal, -1) / jnp.maximum(dist3, 1e-9)
    frustum_ok = view_cos >= 0.5
    # distance within scale-invariance region [0.8 min, 1.2 max]; minDist
    # = maxDist / scale^(nlevels-1)
    min_dist = mp_max_dist / scales[n_levels - 1]
    dist_ok = (dist3 >= 0.8 * min_dist) & (dist3 <= 1.2 * mp_max_dist)

    # predicted scale level (MapPoint::PredictScale)
    ratio = mp_max_dist / jnp.maximum(dist3, 1e-9)
    pred = jnp.ceil(jnp.log(ratio) / log_scale).astype(jnp.int32)
    pred = jnp.clip(pred, 0, n_levels - 1)

    radius = jnp.where(view_cos > 0.998, 2.5, 4.0) * scales[pred] * th

    dx = jnp.abs(uv[:, 0:1] - kp_xy[None, :, 0])
    dy = jnp.abs(uv[:, 1:2] - kp_xy[None, :, 1])
    in_win = (dx < radius[:, None]) & (dy < radius[:, None])
    lvl_ok = (kp_octave[None, :] >= (pred - 1)[:, None]) & (
        kp_octave[None, :] <= pred[:, None]
    )
    row_ok = mp_valid & z_ok & in_img & frustum_ok & dist_ok
    mask = in_win & lvl_ok & row_ok[:, None] & kp_valid_and_free[None, :]

    dist = hamming_matrix(mp_desc, kp_desc)
    INF = jnp.int32(1 << 20)
    d = jnp.where(mask, dist, INF)
    best = jnp.min(d, axis=1)
    best_idx = jnp.argmin(d, axis=1)
    d2 = d.at[jnp.arange(M), best_idx].set(INF)
    second = jnp.min(d2, axis=1)
    second_idx = jnp.argmin(d2, axis=1)
    best_lvl = kp_octave[best_idx]
    second_lvl = kp_octave[second_idx]
    ratio_fail = (
        (best_lvl == second_lvl)
        & (best.astype(jnp.float32) > nn_ratio * second.astype(jnp.float32))
        & (second < INF)
    )
    accept = (best <= TH_HIGH) & row_ok & ~ratio_fail
    final = _first_claim(best_idx, accept, N)
    return jnp.where(final, best_idx, -1)


@jax.jit
def search_for_triangulation(
    desc1, xy1, octave1, free1,
    desc2, xy2, octave2, free2,
    F12, sigma2_levels,
):
    """ORBmatcher::SearchForTriangulation (reference ORBmatcher.cc:965):
    match unassociated keypoints of two keyframes under the epipolar
    constraint dist(kp2, F12^T kp1)^2 < 3.84 sigma2[octave2], best
    distance <= TH_LOW, min-dist conflict resolution per kp2.

    (The reference restricts candidates via shared BoW nodes — a speed
    optimisation; the dense matrix covers the superset.)

    Returns matches (N1,) int32 index into kf2 or -1.
    """
    N1 = xy1.shape[0]
    N2 = xy2.shape[0]
    dist = hamming_matrix(desc1, desc2)

    # epipolar lines in image 2: l = F12^T p1 (reference computes
    # a = kp1.x*F[0,0]+kp1.y*F[1,0]+F[2,0], i.e. columns of F12)
    o = jnp.ones((N1, 1), xy1.dtype)
    p1 = jnp.concatenate([xy1, o], 1)
    l2 = p1 @ F12  # (N1,3): [a, b, c]
    num = l2[:, 0:1] * xy2[None, :, 0] + l2[:, 1:2] * xy2[None, :, 1] + l2[:, 2:3]
    den = l2[:, 0:1] ** 2 + l2[:, 1:2] ** 2
    d2 = num * num / jnp.maximum(den, 1e-12)
    sig2 = sigma2_levels[jnp.clip(octave2, 0, sigma2_levels.shape[0] - 1)]
    epi_ok = d2 < 3.84 * sig2[None, :]

    mask = epi_ok & free1[:, None] & free2[None, :]
    INF = jnp.int32(1 << 20)
    d = jnp.where(mask, dist, INF)
    best = jnp.min(d, axis=1)
    best_idx = jnp.argmin(d, axis=1)
    accept = best <= TH_LOW

    # one kp2 per kp1: min-dist claim
    i1 = jnp.arange(N1, dtype=jnp.int32)
    claim_key = best * N1 + i1
    INF_KEY = jnp.int32(2**31 - 1)
    winner = jnp.full((N2,), INF_KEY, jnp.int32).at[
        jnp.where(accept, best_idx, N2)
    ].min(jnp.where(accept, claim_key, INF_KEY), mode="drop")
    final = accept & (winner[best_idx] == claim_key)
    return jnp.where(final, best_idx, -1)
