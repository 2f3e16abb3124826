"""BoW inverted-file keyframe database.

Replaces src/KeyFrameDatabase.cc: an inverted file word -> [keyframes],
with the reference's exact candidate-accumulation logic for loop
detection (src/KeyFrameDatabase.cc:105-259) and relocalization
(:261-396): shared-word counting, 0.8*maxCommonWords pruning, L1-score
threshold, accumulation over top-10 covisible groups, 0.75*bestAccScore
final cut.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from .mapstore import MapStore
from .vocabulary import Vocabulary


class KeyFrameDatabase:
    def __init__(self, voc: Vocabulary):
        self.voc = voc
        self.inverted: Dict[int, List[int]] = {}
        self.bow: Dict[int, dict] = {}  # kid -> BoW vector

    def add(self, kid: int, bow_vec: dict):
        self.bow[kid] = bow_vec
        for w in bow_vec:
            self.inverted.setdefault(w, []).append(kid)

    def erase(self, kid: int):
        vec = self.bow.pop(kid, None)
        if vec is None:
            return
        for w in vec:
            lst = self.inverted.get(w)
            if lst and kid in lst:
                lst.remove(kid)

    def clear(self):
        self.inverted.clear()
        self.bow.clear()

    # ------------------------------------------------------------------
    def _shared_word_counts(self, bow_vec: dict, exclude: set) -> Dict[int, int]:
        counts: Dict[int, int] = {}
        for w in bow_vec:
            for kid in self.inverted.get(w, ()):
                if kid not in exclude:
                    counts[kid] = counts.get(kid, 0) + 1
        return counts

    def detect_loop_candidates(self, store: MapStore, kid: int,
                               min_score: float) -> List[int]:
        """src/KeyFrameDatabase.cc:105-259."""
        connected = set(store.covis[kid]) | {kid}
        query = self.bow.get(kid)
        if query is None:
            return []
        counts = self._shared_word_counts(query, exclude=connected)
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = 0.8 * max_common
        # score candidates with enough shared words
        scored = {}
        for cand, c in counts.items():
            if c > min_common:
                s = Vocabulary.score_l1(query, self.bow[cand])
                if s >= min_score:
                    scored[cand] = s
        if not scored:
            return []
        # accumulate over covisibility groups (top-10 covisibles)
        acc: Dict[int, tuple] = {}
        best_acc = min_score
        for cand, s in scored.items():
            group = store.get_best_covisibles(cand, 10)
            acc_score = s
            best_kid, best_s = cand, s
            for g in group:
                if g in scored:
                    acc_score += scored[g]
                    if scored[g] > best_s:
                        best_kid, best_s = g, scored[g]
            acc[cand] = (acc_score, best_kid)
            best_acc = max(best_acc, acc_score)
        min_acc = 0.75 * best_acc
        out = []
        seen = set()
        for cand, (acc_score, best_kid) in acc.items():
            if acc_score > min_acc and best_kid not in seen:
                seen.add(best_kid)
                out.append(best_kid)
        return out

    def detect_relocalization_candidates(self, store: MapStore,
                                         bow_vec: dict) -> List[int]:
        """src/KeyFrameDatabase.cc:261-396 — same scheme, no covisible
        exclusion, no absolute minimum score."""
        counts = self._shared_word_counts(bow_vec, exclude=set())
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = 0.8 * max_common
        scored = {cand: Vocabulary.score_l1(bow_vec, self.bow[cand])
                  for cand, c in counts.items() if c > min_common}
        if not scored:
            return []
        acc: Dict[int, tuple] = {}
        best_acc = 0.0
        for cand, s in scored.items():
            group = store.get_best_covisibles(cand, 10)
            acc_score = s
            best_kid, best_s = cand, s
            for g in group:
                if g in scored:
                    acc_score += scored[g]
                    if scored[g] > best_s:
                        best_kid, best_s = g, scored[g]
            acc[cand] = (acc_score, best_kid)
            best_acc = max(best_acc, acc_score)
        min_acc = 0.75 * best_acc
        out = []
        seen = set()
        for cand, (acc_score, best_kid) in acc.items():
            if acc_score > min_acc and best_kid not in seen:
                seen.add(best_kid)
                out.append(best_kid)
        return out
