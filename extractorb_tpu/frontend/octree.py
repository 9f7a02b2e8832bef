"""Quadtree keypoint distribution (DistributeOctTree).

Replaces ORBextractor::DistributeOctTree + ExtractorNode::DivideNode
(reference: src/orb_extractor/ORBextractor.cc:544-771, :486-542): split
the level's bounding box into a quadtree until #leaf-nodes >= N (largest
nodes split first in the final stage), then keep the highest-response
keypoint of every leaf.

Two implementations:

- ``distribute_host``: exact reproduction of the reference's greedy
  algorithm in numpy, used for parity tests and as the default in the
  host-driven pipeline (the input is a few-thousand keypoints; the
  algorithm is inherently sequential/greedy).  Tie-breaking of equal-sized
  nodes in the reference's final stage compares std::list node POINTERS
  (unspecified behaviour); we use stable insertion order, so results can
  differ from a particular reference binary only for exact size ties.

- ``distribute_device``: shape-static jit version for the full-TPU path.
  The quadtree cell boundaries are data-independent (DivideNode's ceil
  halving depends only on the box), so each keypoint's cell at every
  depth is a static table lookup; the device picks the smallest depth
  with >= N occupied cells and keeps the per-cell argmax response.  This
  matches the reference's leaf set except for the partial final-stage
  splits (documented approximation; spatial distribution is equivalent).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------- host exact


class _Node:
    __slots__ = ("ulx", "uly", "brx", "bry", "idx", "no_more")

    def __init__(self, ulx, uly, brx, bry, idx):
        self.ulx, self.uly, self.brx, self.bry = ulx, uly, brx, bry
        self.idx = idx  # np.ndarray of keypoint indices, insertion order
        self.no_more = len(idx) == 1


def _divide(node: _Node, xs, ys) -> List[_Node]:
    half_x = int(np.ceil(np.float32(node.brx - node.ulx) / 2))
    half_y = int(np.ceil(np.float32(node.bry - node.uly) / 2))
    mx, my = node.ulx + half_x, node.uly + half_y
    idx = node.idx
    left = xs[idx] < mx
    top = ys[idx] < my
    return [
        _Node(node.ulx, node.uly, mx, my, idx[left & top]),        # n1
        _Node(mx, node.uly, node.brx, my, idx[~left & top]),       # n2
        _Node(node.ulx, my, mx, node.bry, idx[left & ~top]),       # n3
        _Node(mx, my, node.brx, node.bry, idx[~left & ~top]),      # n4
    ]


def distribute_host(
    xs: np.ndarray,
    ys: np.ndarray,
    responses: np.ndarray,
    min_x: int,
    max_x: int,
    min_y: int,
    max_y: int,
    n_target: int,
    use_native: bool = True,
) -> np.ndarray:
    if use_native:
        from ..native import distribute_octree_native

        out = distribute_octree_native(
            xs, ys, responses, min_x, max_x, min_y, max_y, n_target
        )
        if out is not None:
            return out
    return _distribute_host_py(
        xs, ys, responses, min_x, max_x, min_y, max_y, n_target
    )


def _distribute_host_py(
    xs: np.ndarray,
    ys: np.ndarray,
    responses: np.ndarray,
    min_x: int,
    max_x: int,
    min_y: int,
    max_y: int,
    n_target: int,
) -> np.ndarray:
    """Exact DistributeOctTree; coordinates are ABSOLUTE inner-image
    coords (the reference works on coords relative to minX/minY — we
    shift internally).  Input order must be the reference's insertion
    order; returns indices into the input arrays, one per leaf node, in
    leaf-list order."""
    xs = np.asarray(xs, np.float32) - min_x
    ys = np.asarray(ys, np.float32) - min_y
    w, h = max_x - min_x, max_y - min_y
    n_ini = int(np.floor(w / float(h) + 0.5))  # C++ round()
    n_ini = max(n_ini, 1)
    h_x = np.float32(w) / np.float32(n_ini)

    nodes: List[_Node] = []
    buckets = [[] for _ in range(n_ini)]
    col = np.clip((xs / h_x).astype(np.int64), 0, n_ini - 1)
    for i in range(len(xs)):
        buckets[col[i]].append(i)
    for i in range(n_ini):
        ulx = int(h_x * np.float32(i))
        brx = int(h_x * np.float32(i + 1))
        node = _Node(ulx, 0, brx, h, np.asarray(buckets[i], np.int64))
        if len(node.idx) > 0:
            nodes.append(node)

    finish = False
    while not finish:
        prev_size = len(nodes)
        new_nodes: List[_Node] = []
        to_expand: List[_Node] = []
        for node in nodes:
            if node.no_more:
                new_nodes.append(node)
                continue
            for child in _divide(node, xs, ys):
                if len(child.idx) == 0:
                    continue
                new_nodes.append(child)
                if len(child.idx) > 1:
                    to_expand.append(child)
        nodes = new_nodes
        if len(nodes) >= n_target or len(nodes) == prev_size:
            finish = True
        elif len(nodes) + 3 * len(to_expand) > n_target:
            # final stage: split largest nodes first until >= N
            while not finish:
                prev_size = len(nodes)
                order = sorted(
                    range(len(to_expand)),
                    key=lambda j: len(to_expand[j].idx),
                )
                prev_expand = [to_expand[j] for j in order]
                to_expand = []
                for node in reversed(prev_expand):
                    nodes.remove(node)
                    for child in _divide(node, xs, ys):
                        if len(child.idx) == 0:
                            continue
                        nodes.append(child)
                        if len(child.idx) > 1:
                            to_expand.append(child)
                    if len(nodes) >= n_target:
                        break
                if len(nodes) >= n_target or len(nodes) == prev_size:
                    finish = True

    out = []
    for node in nodes:
        r = responses[node.idx]
        out.append(node.idx[int(np.argmax(r))])  # argmax keeps first max
    return np.asarray(out, np.int64)


# ----------------------------------------------------------- device approx


def _cuts_for_depth(w: int, h: int, d_max: int):
    """Static x/y cell left-edges per depth, following DivideNode's ceil
    halving.  Returns lists of np arrays indexed by depth."""
    n_ini = max(int(np.floor(w / float(h) + 0.5)), 1)
    h_x = np.float32(w) / np.float32(n_ini)
    x_edges = [
        np.asarray([int(h_x * np.float32(i)) for i in range(n_ini)] + [w])
    ]
    y_edges = [np.asarray([0, h])]

    def split(edges):
        out = []
        for a, b in zip(edges[:-1], edges[1:]):
            half = int(np.ceil(np.float32(b - a) / 2))
            mid = a + half
            out.append(a)
            if mid < b and mid > a:
                out.append(mid)
        out.append(edges[-1])
        return np.asarray(sorted(set(out)))

    for _ in range(d_max):
        x_edges.append(split(x_edges[-1]))
        y_edges.append(split(y_edges[-1]))
    return x_edges, y_edges


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def distribute_device(
    xy: jnp.ndarray,
    resp: jnp.ndarray,
    valid: jnp.ndarray,
    n_target: int,
    width: int,
    height: int,
    min_x: int,
    min_y: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jit quadtree distribution.  xy: (K, 2) absolute inner coords.

    Returns (keep_mask (K,), depth_used ()).  Keeps the argmax-response
    keypoint of every occupied cell at the smallest depth whose occupied
    cell count reaches n_target (or the deepest table).
    """
    d_max = 7
    x_edges, y_edges = _cuts_for_depth(width, height, d_max)
    K = xy.shape[0]
    x = xy[:, 0] - min_x
    y = xy[:, 1] - min_y

    # One searchsorted pair at the FINEST depth; coarser cell indices come
    # from static fine->coarse lookup tables (cells nest).
    def coarse_map(fine_edges, coarse_edges):
        # index of the coarse interval containing each fine interval
        return np.searchsorted(
            coarse_edges[1:-1], fine_edges[:-1], side="right"
        ).astype(np.int32)

    xe_f = jnp.asarray(x_edges[d_max][1:-1])
    ye_f = jnp.asarray(y_edges[d_max][1:-1])
    cx_f = jnp.searchsorted(xe_f, x, side="right").astype(jnp.int32)
    cy_f = jnp.searchsorted(ye_f, y, side="right").astype(jnp.int32)

    # Occupancy per depth and the final per-cell argmax are computed with
    # small lexicographic sorts over the K keypoints — TPU scatters into
    # cell grids lower to one-hot expansions costing 100s of MB.
    SENT = jnp.int32(2**30)
    counts = []
    cells_per_depth = []
    for d in range(d_max + 1):
        if d == d_max:
            cx, cy = cx_f, cy_f
        else:
            cx = jnp.asarray(coarse_map(x_edges[d_max], x_edges[d]))[cx_f]
            cy = jnp.asarray(coarse_map(y_edges[d_max], y_edges[d]))[cy_f]
        n_cx = len(x_edges[d]) - 1
        cell = jnp.where(valid, cy * n_cx + cx, SENT).astype(jnp.int32)
        cells_per_depth.append(cell)
        srt = jnp.sort(cell)
        newgrp = jnp.concatenate(
            [jnp.ones((1,), bool), srt[1:] != srt[:-1]]
        )
        counts.append(jnp.sum((newgrp & (srt < SENT)).astype(jnp.int32)))

    counts = jnp.stack(counts)  # (d_max+1,)
    reached = counts >= n_target
    depth = jnp.where(jnp.any(reached), jnp.argmax(reached), d_max)

    cell = jnp.select(
        [depth == d for d in range(d_max + 1)], cells_per_depth
    ).astype(jnp.int32)
    # per-cell argmax response, earliest-index tiebreak (reference keeps
    # the first max in node insertion order): lexicographic sort by
    # (cell asc, resp desc, idx asc); group leaders win; unsort by idx.
    idx = jnp.arange(K, dtype=jnp.int32)
    neg_resp = jnp.int32(255) - resp
    c_s, r_s, i_s = jax.lax.sort((cell, neg_resp, idx), num_keys=3)
    leader = jnp.concatenate([jnp.ones((1,), bool), c_s[1:] != c_s[:-1]])
    leader &= c_s < SENT
    # restore original order: sort (i_s, leader) by index
    _, keep = jax.lax.sort((i_s, leader.astype(jnp.int32)), num_keys=1)
    keep = keep.astype(bool) & valid
    return keep, depth
