"""Keyframe database: loop / relocalization candidate retrieval.

Replacement for src/KeyFrameDatabase.cpp: the inverted file becomes a dense
(K, n_words) BoW matrix (moderate vocabularies) so shared-word counts and
accumulated scores are batched matrix ops; the candidate-selection logic
(min common words, 0.75*best retention, covisibility-group accumulation)
follows KeyFrameDatabase::DetectLoopCandidates (:80-201) /
DetectRelocalizationCandidates (:203-315).
"""
from __future__ import annotations

import numpy as np

from .vocabulary import Vocabulary


class KeyFrameDatabase:
    def __init__(self, vocab: Vocabulary, max_keyframes=1024):
        self.vocab = vocab
        self.bow = np.zeros((max_keyframes, vocab.n_words), np.float32)
        self.has = np.zeros(max_keyframes, bool)

    def add(self, kid: int, descriptors: np.ndarray):
        self.bow[kid] = self.vocab.bow_vector(descriptors)
        self.has[kid] = True

    def erase(self, kid: int):
        self.has[kid] = False

    def bow_of(self, kid):
        return self.bow[kid]

    def score(self, kid_a, kid_b):
        return Vocabulary.l1_score(self.bow[kid_a], self.bow[kid_b])

    def _common_words(self, vec, mask):
        shared = ((self.bow > 0) & (vec > 0)[None, :]) & mask[:, None]
        return shared.sum(1)

    def detect_loop_candidates(self, kid, min_score, connected, map_store):
        """KeyFrameDatabase::DetectLoopCandidates (KeyFrameDatabase.cpp:80-201).

        connected: covisible KF ids of `kid` (excluded from candidacy).
        Returns candidate KF ids (accumulated-score filtered).
        """
        mask = self.has.copy()
        mask[kid] = False
        mask[connected] = False
        vec = self.bow[kid]
        common = self._common_words(vec, mask)
        if common.max(initial=0) == 0:
            return np.array([], np.int64)
        min_common = int(0.8 * common.max())
        cand = np.flatnonzero((common > min_common) & mask)
        if len(cand) == 0:
            return np.array([], np.int64)
        scores = np.array([Vocabulary.l1_score(vec, self.bow[c]) for c in cand])
        keep = scores >= min_score
        cand, scores = cand[keep], scores[keep]
        if len(cand) == 0:
            return np.array([], np.int64)
        # accumulate over covisibility groups; retain >= 0.75 * best
        acc_scores = []
        best_of_group = []
        for c, s in zip(cand, scores):
            neigh, _ = map_store.covisible_keyframes(int(c), n=10)
            group = [int(c)] + [int(n) for n in neigh]
            acc = 0.0
            best_kf, best_s = int(c), s
            for g in group:
                if g in cand:
                    gs = scores[np.flatnonzero(cand == g)[0]]
                    acc += gs
                    if gs > best_s:
                        best_s, best_kf = gs, g
            acc_scores.append(acc)
            best_of_group.append(best_kf)
        acc_scores = np.array(acc_scores)
        th = 0.75 * acc_scores.max()
        out = {best_of_group[i] for i in np.flatnonzero(acc_scores >= th)}
        return np.array(sorted(out), np.int64)

    def detect_relocalization_candidates(self, descriptors, map_store):
        """KeyFrameDatabase::DetectRelocalizationCandidates (:203-315)."""
        vec = self.vocab.bow_vector(descriptors)
        mask = self.has.copy()
        common = self._common_words(vec, mask)
        if common.max(initial=0) == 0:
            return np.array([], np.int64)
        min_common = int(0.8 * common.max())
        cand = np.flatnonzero((common > min_common) & mask)
        if len(cand) == 0:
            return np.array([], np.int64)
        scores = np.array([Vocabulary.l1_score(vec, self.bow[c]) for c in cand])
        acc_scores = []
        best_of_group = []
        for c, s in zip(cand, scores):
            neigh, _ = map_store.covisible_keyframes(int(c), n=10)
            group = [int(c)] + [int(n) for n in neigh]
            acc, best_kf, best_s = 0.0, int(c), s
            for g in group:
                if g in cand:
                    gs = scores[np.flatnonzero(cand == g)[0]]
                    acc += gs
                    if gs > best_s:
                        best_s, best_kf = gs, g
            acc_scores.append(acc)
            best_of_group.append(best_kf)
        acc_scores = np.array(acc_scores)
        th = 0.75 * acc_scores.max()
        out = {best_of_group[i] for i in np.flatnonzero(acc_scores >= th)}
        return np.array(sorted(out), np.int64)
