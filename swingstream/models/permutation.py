"""Permutation significance test with Welford accumulation.

Semantics of [ref: Swing/Window.py::run_permutation_test,
update_variance_2D ~L?] (SURVEY.md §2.4 A2): for each permutation draw,
shuffle each explanatory column independently, refit, and accumulate the
running mean/variance of the null importance per feature with Welford's
algorithm; the observed importance is converted to a z-score and a
two-sided p-value under the permutation null.

Deterministic: the permutation RNG is seeded by the caller (derived from
xxhash64(host, win_start, target) upstream — SURVEY.md §4.3 pin #1).
"""

from __future__ import annotations

import math

import numpy as np


def normal_sf(z: np.ndarray) -> np.ndarray:
    """Survival function 1 - Phi(z) via erfc (no scipy in hot path)."""
    z = np.asarray(z, dtype=np.float64)
    return 0.5 * np.vectorize(math.erfc)(z / math.sqrt(2.0))


def permutation_zscores(
    X: np.ndarray,
    y: np.ndarray,
    observed: np.ndarray,
    fit_fn,
    *,
    n_permutations: int = 10,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Return (z, p) for observed importances vs the permutation null.

    ``fit_fn(Xp, y) -> importance vector`` is the same scorer used for
    the observed fit (lasso or RF).  Welford update per draw — O(1)
    memory, matching the reference's update_variance_2D trick.
    """
    X = np.asarray(X, dtype=np.float64)
    rng = np.random.default_rng(seed)
    p = X.shape[1]
    mean = np.zeros(p)
    m2 = np.zeros(p)
    for i in range(1, n_permutations + 1):
        Xp = np.empty_like(X)
        for j in range(p):
            Xp[:, j] = X[rng.permutation(len(X)), j]
        imp = np.asarray(fit_fn(Xp, y), dtype=np.float64)
        delta = imp - mean
        mean += delta / i
        m2 += delta * (imp - mean)
    if n_permutations < 2:
        return np.zeros(p), np.ones(p)
    var = m2 / (n_permutations - 1)
    sd = np.sqrt(np.where(var > 0.0, var, np.inf))
    z = (np.asarray(observed, dtype=np.float64) - mean) / sd
    pval = 2.0 * normal_sf(np.abs(z))
    return z, pval
