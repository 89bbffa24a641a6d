"""t0: numpy regression kernels vs analytic cases + planted-edge recovery."""

from __future__ import annotations

import numpy as np

from swingstream.models.lasso import (
    bootstrap_stability,
    cv_select_alpha,
    lasso_cd,
    max_alpha,
)
from swingstream.models.permutation import normal_sf, permutation_zscores
from swingstream.models.rf import extra_trees_importance


def _toy(n=200, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 6))
    y = 3.0 * X[:, 0] - 2.0 * X[:, 2] + 0.1 * rng.normal(size=n)
    return X, y


def test_lasso_zero_at_max_alpha():
    X, y = _toy()
    a = max_alpha(X, y)
    assert np.allclose(lasso_cd(X, y, a * 1.0001), 0.0)


def test_lasso_recovers_support():
    X, y = _toy()
    beta = lasso_cd(X, y, 0.05)
    assert abs(beta[0]) > 1.0 and abs(beta[2]) > 0.5
    others = np.delete(np.abs(beta), [0, 2])
    assert others.max() < 0.1


def test_lasso_matches_ols_at_zero_alpha():
    # alpha=0 => ordinary least squares on standardized X
    rng = np.random.default_rng(1)
    X = rng.normal(size=(300, 4))
    beta_true = np.array([1.0, -2.0, 0.5, 0.0])
    y = X @ beta_true
    beta = lasso_cd(X, y, 0.0, max_iter=2000, tol=1e-12)
    Xs = (X - X.mean(0)) / X.std(0)
    ols = np.linalg.lstsq(Xs, y - y.mean(), rcond=None)[0]
    assert np.allclose(beta, ols, atol=1e-5)


def test_cv_alpha_deterministic_and_sane():
    X, y = _toy()
    a1 = cv_select_alpha(X, y)
    a2 = cv_select_alpha(X, y)
    assert a1 == a2
    assert 0 < a1 < max_alpha(X, y)
    # CV alpha should keep the true support
    beta = lasso_cd(X, y, a1)
    assert abs(beta[0]) > 0.5 and abs(beta[2]) > 0.3


def test_bootstrap_stability_separates_signal():
    X, y = _toy()
    stab = bootstrap_stability(X, y, 0.05, n_bootstraps=15, seed=7)
    assert stab[0] == 1.0 and stab[2] == 1.0
    assert stab[[1, 3, 4, 5]].max() <= 0.6


def test_rf_importance_ranks_signal_features():
    X, y = _toy(n=300)
    imp = extra_trees_importance(X, y, n_trees=40, seed=3)
    assert imp[0] == imp.max()
    assert imp[2] > np.delete(imp, [0, 2]).max()
    # determinism
    imp2 = extra_trees_importance(X, y, n_trees=40, seed=3)
    assert np.array_equal(imp, imp2)


def test_permutation_pvalues():
    X, y = _toy(n=150)
    fit = lambda Xp, yp: np.abs(lasso_cd(Xp, yp, 0.05, max_iter=200))
    obs = fit(X, y)
    z, p = permutation_zscores(X, y, obs, fit, n_permutations=8, seed=11)
    assert p[0] < 0.05 and p[2] < 0.05


def test_normal_sf():
    assert abs(normal_sf(np.array([0.0]))[0] - 0.5) < 1e-12
    assert abs(normal_sf(np.array([1.96]))[0] - 0.0249979) < 1e-4


def test_plsr_vip_ranks_signal():
    from swingstream.models.plsr import plsr_vip

    X, y = _toy(n=200)
    vip = plsr_vip(X, y, n_components=3)
    assert vip[0] == vip.max()
    assert vip[2] > np.delete(vip, [0, 2]).max()
    # determinism
    assert np.array_equal(vip, plsr_vip(X, y, n_components=3))
    # degenerate target
    assert np.allclose(plsr_vip(X, np.zeros(len(y))), 0.0)
