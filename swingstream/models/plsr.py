"""Partial-least-squares regression (NIPALS) + VIP importance scores.

Re-implements the semantics of the reference's PLSR window scorer
[ref: Swing/DionesusWindow.py ~L?] (SURVEY.md §2.9 U6, lowest-priority
method) from scratch in numpy: NIPALS component extraction on the
standardized design, VIP (variable importance in projection) as the
per-regulator importance.  Deterministic — NIPALS is seeded by the data
itself (dominant-direction initialization), no RNG.
"""

from __future__ import annotations

import numpy as np

from swingstream.models.lasso import _standardize


def nipals_pls(
    X: np.ndarray,
    y: np.ndarray,
    n_components: int = 3,
    max_iter: int = 200,
    tol: float = 1e-9,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-response NIPALS.  Returns (W, T, q): X-weights (p, a),
    scores (n, a), y-loadings (a,)."""
    Xc, _, _ = _standardize(np.asarray(X, dtype=np.float64))
    yc = np.asarray(y, dtype=np.float64)
    yc = yc - yc.mean()
    sd = yc.std()
    yc = yc / sd if sd > 0 else yc
    n, p = Xc.shape
    a = min(n_components, p, max(n - 1, 1))
    W = np.zeros((p, a))
    T = np.zeros((n, a))
    q = np.zeros(a)
    E, f = Xc.copy(), yc.copy()
    for k in range(a):
        w = E.T @ f
        norm = np.linalg.norm(w)
        if norm < tol:
            break
        w = w / norm
        t = E @ w
        tt = float(t @ t)
        if tt < tol:
            break
        p_load = E.T @ t / tt
        qk = float(f @ t) / tt
        E = E - np.outer(t, p_load)
        f = f - qk * t
        W[:, k], T[:, k], q[k] = w, t, qk
    return W, T, q


def plsr_vip(X: np.ndarray, y: np.ndarray, n_components: int = 3) -> np.ndarray:
    """VIP scores: sqrt(p * Σ_a SS_a (w_ja/||w_a||)^2 / Σ_a SS_a).

    SS_a = q_a^2 t_a^T t_a — the y-variance explained by component a.
    """
    X = np.asarray(X, dtype=np.float64)
    p = X.shape[1]
    W, T, q = nipals_pls(X, y, n_components)
    ss = (q**2) * np.einsum("ij,ij->j", T, T)
    total = ss.sum()
    if total <= 0:
        return np.zeros(p)
    wnorm = np.linalg.norm(W, axis=0)
    wnorm = np.where(wnorm > 0, wnorm, 1.0)
    contrib = (W / wnorm) ** 2 @ ss
    return np.sqrt(p * contrib / total)
