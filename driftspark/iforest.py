"""Minimal Isolation Forest (numpy) — sklearn-free density backend.

Standard algorithm (Liu, Ting, Zhou 2008): ``n_estimators`` random binary
trees, each grown on a ``max_samples`` subsample with uniformly random
(feature, split) choices down to isolation or the depth cap; anomaly score
2^(-E[path length]/c(psi)).  ``score_samples`` returns the NEGATED score
like sklearn's, so the hallucination detector can negate it back into a
"distance" (reference confidence_density.py:406-413).

Fitting happens on a driver-side reference sample; the fitted tree arrays
are broadcast and evaluated inside a vectorized pandas UDF.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np


def _c(psi: int) -> float:
    """Average path length of unsuccessful BST search (normalizer)."""
    if psi <= 1:
        return 0.0
    if psi == 2:
        return 1.0
    h = math.log(psi - 1) + 0.5772156649015329
    return 2.0 * h - 2.0 * (psi - 1) / psi


class IsolationForest:
    """Array-based iForest: each tree is (feature[], threshold[], left[],
    right[], size[]) with -1 marking leaves; picklable + broadcastable."""

    def __init__(
        self,
        n_estimators: int = 200,
        max_samples: int = 256,
        random_state: int | None = 42,
    ):
        self.n_estimators = n_estimators
        self.max_samples = max_samples
        self.random_state = random_state
        self.trees: List[Tuple[np.ndarray, ...]] = []
        self._psi = 0

    def fit(self, X: np.ndarray) -> "IsolationForest":
        rng = np.random.RandomState(self.random_state)
        n = len(X)
        self._psi = min(self.max_samples, n)
        depth_cap = int(np.ceil(np.log2(max(self._psi, 2))))
        self.trees = []
        for _ in range(self.n_estimators):
            idx = rng.choice(n, self._psi, replace=False)
            feat, thr, left, right, size = [], [], [], [], []

            def grow(rows: np.ndarray, depth: int) -> int:
                node = len(feat)
                feat.append(-1)
                thr.append(0.0)
                left.append(-1)
                right.append(-1)
                size.append(len(rows))
                if depth >= depth_cap or len(rows) <= 1:
                    return node
                sub = X[rows]
                spans = sub.max(axis=0) - sub.min(axis=0)
                valid = np.where(spans > 0)[0]
                if len(valid) == 0:
                    return node
                f = int(rng.choice(valid))
                lo, hi = sub[:, f].min(), sub[:, f].max()
                t = float(rng.uniform(lo, hi))
                mask = sub[:, f] < t
                feat[node] = f
                thr[node] = t
                left[node] = grow(rows[mask], depth + 1)
                right[node] = grow(rows[~mask], depth + 1)
                return node

            grow(idx, 0)
            self.trees.append(
                (
                    np.array(feat, dtype=np.int32),
                    np.array(thr, dtype=np.float64),
                    np.array(left, dtype=np.int32),
                    np.array(right, dtype=np.int32),
                    np.array(size, dtype=np.int64),
                )
            )
        return self

    def _path_lengths(self, X: np.ndarray, tree) -> np.ndarray:
        feat, thr, left, right, size = tree
        n = len(X)
        node = np.zeros(n, dtype=np.int32)
        depth = np.zeros(n, dtype=np.float64)
        active = np.arange(n)
        while len(active):
            nd = node[active]
            f = feat[nd]
            internal = f >= 0
            act_int = active[internal]
            if len(act_int) == 0:
                break
            nd_int = node[act_int]
            goes_left = X[act_int, feat[nd_int]] < thr[nd_int]
            node[act_int] = np.where(goes_left, left[nd_int], right[nd_int])
            depth[act_int] += 1.0
            active = act_int
        leaf_size = size[node]
        # unexplored-subtree correction c(size) at the leaf
        adj = np.array([_c(int(s)) for s in leaf_size])
        return depth + adj

    def score_samples(self, X: np.ndarray) -> np.ndarray:
        """sklearn-compatible: returns -(2^(-E[h]/c(psi))) in [-1, 0)."""
        X = np.asarray(X, dtype=np.float64)
        total = np.zeros(len(X), dtype=np.float64)
        for tree in self.trees:
            total += self._path_lengths(X, tree)
        mean_depth = total / len(self.trees)
        cn = _c(self._psi)
        score = np.power(2.0, -mean_depth / max(cn, 1e-12))
        return -score
