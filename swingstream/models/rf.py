"""Seeded extra-trees regression-forest feature importance in pure numpy.

Re-implements the *semantics* of the reference's RandomForest window
scorer [ref: Swing/RFRWindow.py::fit_window, get_coeffs ~L?]
(sklearn RandomForestRegressor(n_estimators, max_features='sqrt'),
importance = mean impurity decrease) from scratch — no sklearn in the
sandbox (SURVEY.md §0, §7 risk #1).

Design choice (SURVEY.md §2.9 U6): ExtraTrees-style splits — at each
node draw `max_features` candidate features and ONE uniform-random
threshold per feature, pick the best by variance reduction.  Random
thresholds are far cheaper to make deterministic than exact CART and
give equivalent GENIE3-style importance semantics.  Determinism: all
randomness flows from a single integer seed per tree (derived upstream
from xxhash64(host, win_start, target, tree) — §4.3 pin #1).
"""

from __future__ import annotations

import numpy as np

_MIN_SAMPLES_SPLIT = 4


def _fit_tree(
    X: np.ndarray,
    y: np.ndarray,
    rng: np.random.Generator,
    max_features: int,
    max_depth: int,
    importances: np.ndarray,
) -> None:
    """One extra-tree; accumulates variance-reduction importance in place."""
    n_total = len(y)
    # iterative DFS: (row_index_array, depth)
    stack: list[tuple[np.ndarray, int]] = [(np.arange(n_total), 0)]
    while stack:
        idx, depth = stack.pop()
        n = len(idx)
        yn = y[idx]
        var = yn.var()
        if depth >= max_depth or n < _MIN_SAMPLES_SPLIT or var <= 1e-15:
            continue
        feats = rng.choice(X.shape[1], size=min(max_features, X.shape[1]), replace=False)
        best_gain, best_feat, best_mask = 0.0, -1, None
        for f in feats:
            col = X[idx, f]
            lo, hi = col.min(), col.max()
            if hi <= lo:
                continue
            thr = rng.uniform(lo, hi)
            mask = col <= thr
            nl = int(mask.sum())
            if nl == 0 or nl == n:
                continue
            yl, yr = yn[mask], yn[~mask]
            gain = var - (nl * yl.var() + (n - nl) * yr.var()) / n
            if gain > best_gain:
                best_gain, best_feat, best_mask = gain, int(f), mask
        if best_feat < 0:
            continue
        importances[best_feat] += (n / n_total) * best_gain
        stack.append((idx[best_mask], depth + 1))
        stack.append((idx[~best_mask], depth + 1))


def extra_trees_importance(
    X: np.ndarray,
    y: np.ndarray,
    *,
    n_trees: int = 50,
    max_depth: int = 4,
    seed: int = 0,
) -> np.ndarray:
    """Mean impurity-decrease importance over a seeded extra-trees ensemble.

    max_features = ceil(sqrt(p)) mirrors the reference's
    `max_features='sqrt'` [ref: Swing/RFRWindow.py ~L?].
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, p = X.shape
    imp = np.zeros(p)
    if n == 0 or p == 0:
        return imp
    max_features = max(1, int(np.ceil(np.sqrt(p))))
    for t in range(n_trees):
        rng = np.random.default_rng((int(seed) + t * 0x9E3779B97F4A7C15) % (1 << 64))
        # bagging: bootstrap rows per tree (reference RF default bootstrap=True)
        idx = rng.integers(0, n, size=n)
        tree_imp = np.zeros(p)
        _fit_tree(X[idx], y[idx], rng, max_features, max_depth, tree_imp)
        imp += tree_imp
    return imp / n_trees
