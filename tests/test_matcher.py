"""Matcher tests: Hamming matrix vs numpy popcount, mutual-best vs cv2
BFMatcher (the reference demo's oracle, main_matcher.cpp:243-250), and
SearchForInitialization vs an exact sequential oracle of
ORBmatcher.cc:706-822."""

import cv2
import numpy as np
import jax.numpy as jnp

from extractorb_tpu.config import ORBConfig
from extractorb_tpu.frontend import extractor as fext
from extractorb_tpu.frontend import matcher as fmatch


def np_hamming(d1, d2):
    a = np.unpackbits(d1, axis=1).astype(np.int32)
    b = np.unpackbits(d2, axis=1).astype(np.int32)
    return (a[:, None, :] != b[None, :, :]).sum(-1)


def test_hamming_matrix_exact(rng):
    d1 = rng.integers(0, 256, (64, 32), dtype=np.uint8)
    d2 = rng.integers(0, 256, (96, 32), dtype=np.uint8)
    got = np.asarray(fmatch.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2)))
    exp = np_hamming(d1, d2)
    assert np.array_equal(got, exp)


def extract_pair(tum_pair, n_features=1000):
    cfg = ORBConfig(n_features=n_features)
    ext = fext.ORBExtractor(cfg, octree="host")
    a, b = tum_pair
    return ext(jnp.asarray(a)), ext(jnp.asarray(b))


def test_mutual_best_vs_bfmatcher(tum_pair):
    f1, f2 = extract_pair(tum_pair)
    m12, dmin = fmatch.mutual_best_match(f1.desc, f1.valid, f2.desc, f2.valid)
    m12 = np.asarray(m12)
    v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
    d1 = np.asarray(f1.desc)[v1]
    d2 = np.asarray(f2.desc)[v2]
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    matches = bf.match(d1, d2)
    exp = {(m.queryIdx, m.trainIdx) for m in matches if m.distance <= 50}
    got = {(i, m12[i]) for i in range(len(m12)) if m12[i] >= 0}
    # identical up to distance ties in argmin order
    inter = len(exp & got)
    assert inter >= 0.95 * max(len(exp), 1), (len(exp), len(got), inter)
    assert abs(len(exp) - len(got)) <= 0.05 * max(len(exp), 1) + 2


def seq_search_for_initialization(f1, f2, window=100, ratio=0.9):
    """Exact sequential oracle (numpy) of the reference algorithm."""
    v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
    xy1, xy2 = np.asarray(f1.xy), np.asarray(f2.xy)
    a1, a2 = np.asarray(f1.angle), np.asarray(f2.angle)
    o1, o2 = np.asarray(f1.octave), np.asarray(f2.octave)
    dist = np_hamming(np.asarray(f1.desc), np.asarray(f2.desc))
    N1, N2 = dist.shape
    matches12 = np.full(N1, -1)
    matches21 = np.full(N2, -1)
    matched_dist = np.full(N2, 1 << 30)
    rot_hist = [[] for _ in range(30)]
    for i1 in range(N1):
        if not v1[i1] or o1[i1] != 0:
            continue
        cand = np.where(
            v2 & (o2 == 0)
            & (np.abs(xy2[:, 0] - xy1[i1, 0]) < window)
            & (np.abs(xy2[:, 1] - xy1[i1, 1]) < window)
        )[0]
        best, best2, best_idx = 1 << 30, 1 << 30, -1
        for i2 in cand:
            d = dist[i1, i2]
            if matched_dist[i2] <= d:
                continue
            if d < best:
                best2, best, best_idx = best, d, i2
            elif d < best2:
                best2 = d
        if best <= 50 and best < best2 * ratio:
            if matches21[best_idx] >= 0:
                matches12[matches21[best_idx]] = -1
            matches12[i1] = best_idx
            matches21[best_idx] = i1
            matched_dist[best_idx] = best
            rot = a1[i1] - a2[best_idx]
            if rot < 0:
                rot += 360.0
            b = int(np.rint(rot / 30.0))
            if b == 30:
                b = 0
            rot_hist[b].append(i1)
    counts = [len(h) for h in rot_hist]
    order = np.argsort(counts)[::-1]
    ind = [order[0], -1, -1]
    if counts[order[1]] >= 0.1 * counts[order[0]]:
        ind[1] = order[1]
    if counts[order[2]] >= 0.1 * counts[order[0]]:
        ind[2] = order[2]
    for b in range(30):
        if b in ind:
            continue
        for i1 in rot_hist[b]:
            if matches12[i1] >= 0:
                matches12[i1] = -1
    return matches12


def test_search_for_initialization_vs_oracle(tum_pair):
    f1, f2 = extract_pair(tum_pair)
    got = np.asarray(
        fmatch.search_for_initialization(
            f1.desc, f1.xy, f1.angle, f1.octave, f1.valid,
            f2.desc, f2.xy, f2.angle, f2.octave, f2.valid,
        )
    )
    exp = seq_search_for_initialization(f1, f2)
    got_pairs = {(i, got[i]) for i in np.where(got >= 0)[0]}
    exp_pairs = {(i, exp[i]) for i in np.where(exp >= 0)[0]}
    inter = len(got_pairs & exp_pairs)
    # the sequential vMatchedDistance side effect on second-best values is
    # not modelled on device; everything else is exact
    assert len(exp_pairs) > 50, len(exp_pairs)
    assert inter >= 0.97 * len(exp_pairs), (len(exp_pairs), len(got_pairs), inter)
    assert abs(len(got_pairs) - len(exp_pairs)) <= max(3, 0.03 * len(exp_pairs))
