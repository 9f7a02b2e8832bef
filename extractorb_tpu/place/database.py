"""Keyframe database: BoW place-recognition queries.

Replaces KeyFrameDatabase (reference: src/KeyFrameDatabase.cc:39 add,
:612 DetectNBestCandidates, :783 DetectRelocalizationCandidates).

TPU design: instead of a word->keyframe inverted file walked per query
word, keyframe BoW histograms are rows of one dense (K, W) matrix, so a
query is a single matvec on the MXU: L1 scores for ALL keyframes at
once, followed by the reference's shared-word gating and
covisibility-group accumulation on the selected candidates.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


class KeyFrameDatabase:
    def __init__(self, vocab, capacity: int = 512):
        self.vocab = vocab
        self.capacity = capacity
        self.hists = np.zeros((capacity, vocab.n_words), np.float32)
        self.has_word = np.zeros((capacity, vocab.n_words), bool)
        self.kf_ids = np.full(capacity, -1, np.int64)
        self.rows: Dict[int, int] = {}
        self._next = 0

    def add(self, kf_id: int, descs: np.ndarray, valid=None):
        if self._next >= self.capacity:
            self._grow()
        row = self._next
        self._next += 1
        h = self.vocab.bow_vector(descs, valid)
        self.hists[row] = h
        self.has_word[row] = h > 0
        self.kf_ids[row] = kf_id
        self.rows[kf_id] = row

    def rekey(self, old_id: int, new_id: int):
        """Rename an entry in place (used when Atlas maps merge and the
        welded keyframes receive new ids)."""
        row = self.rows.pop(old_id, None)
        if row is not None:
            self.kf_ids[row] = new_id
            self.rows[new_id] = row

    def erase(self, kf_id: int):
        row = self.rows.pop(kf_id, None)
        if row is not None:
            self.kf_ids[row] = -1
            self.hists[row] = 0
            self.has_word[row] = False

    def _grow(self):
        c = self.capacity
        self.capacity *= 2
        self.hists = np.concatenate(
            [self.hists, np.zeros((c, self.vocab.n_words), np.float32)]
        )
        self.has_word = np.concatenate(
            [self.has_word, np.zeros((c, self.vocab.n_words), bool)]
        )
        self.kf_ids = np.concatenate([self.kf_ids, np.full(c, -1, np.int64)])

    # --------------------------------------------------------------- query

    def _scores(self, query_hist: np.ndarray):
        """L1 similarity score for every stored KF (DBoW2 L1 scoring:
        s = 2 - |v - w|_1 over normalised vectors, halved to [0,1]-ish).
        Dense matvec — one MXU pass at scale."""
        diff = np.abs(self.hists[: self._next] - query_hist[None, :]).sum(1)
        return 1.0 - 0.5 * diff

    def query(
        self,
        descs: np.ndarray,
        valid=None,
        exclude: Optional[set] = None,
        n_best: int = 3,
        min_common_ratio: float = 0.8,
        covis_fn=None,
        rel_score_ratio: Optional[float] = None,
    ) -> List[Tuple[int, float]]:
        """DetectNBestCandidates / DetectRelocalizationCandidates query
        (reference KeyFrameDatabase.cc:612-897): shared-word gate at
        min_common_ratio * max_common_words, then — when `covis_fn`
        provides each stored keyframe's covisibility group — accumulate
        scores over the group and return the best keyframe per group,
        ranked by accumulated score.

        covis_fn: kf_key -> iterable of kf_keys (top covisibles).
        rel_score_ratio: if set (reloc uses 0.75), return ALL groups with
        accScore >= ratio * best accScore instead of the top n_best.

        Returns [(kf_id, acc_score)] best-first.
        """
        if self._next == 0:
            return []
        q = self.vocab.bow_vector(descs, valid)
        qw = q > 0
        common = (self.has_word[: self._next] & qw[None, :]).sum(1)
        live = self.kf_ids[: self._next] >= 0
        if exclude:
            for kid in exclude:
                row = self.rows.get(kid)
                if row is not None and row < self._next:
                    live[row] = False
        if not live.any():
            return []
        max_common = common[live].max()
        gate = live & (common >= min_common_ratio * max_common) & (common > 0)
        if not gate.any():
            return []
        scores = self._scores(q)

        if covis_fn is None:
            idx = np.where(gate)[0]
            order = idx[np.argsort(-scores[idx])][:n_best]
            return [(int(self.kf_ids[i]), float(scores[i])) for i in order]

        # covisibility-group accumulation: every word-sharing keyframe
        # contributes its score to the groups it belongs to; the group's
        # representative is its highest-scoring member
        sharing = live & (common > 0)
        score_of = {
            int(self.kf_ids[r]): float(scores[r])
            for r in np.where(sharing)[0]
        }
        groups: List[Tuple[float, int]] = []
        for r in np.where(gate)[0]:
            seed = int(self.kf_ids[r])
            acc = score_of.get(seed, 0.0)
            best_kf, best_s = seed, acc
            for member in list(covis_fn(seed))[:10]:
                s = score_of.get(int(member))
                if s is None:
                    continue  # not word-sharing with the query
                acc += s
                if s > best_s:
                    best_kf, best_s = int(member), s
            groups.append((acc, best_kf))
        if not groups:
            return []
        groups.sort(key=lambda g: -g[0])
        out: List[Tuple[int, float]] = []
        seen: set = set()
        if rel_score_ratio is not None:
            min_acc = rel_score_ratio * groups[0][0]
            for acc, kf in groups:
                if acc < min_acc:
                    break
                if kf not in seen:
                    seen.add(kf)
                    out.append((kf, acc))
        else:
            for acc, kf in groups:
                if kf not in seen:
                    seen.add(kf)
                    out.append((kf, acc))
                if len(out) >= n_best:
                    break
        return out
