"""Batched Kalman filter as jit-able JAX ops (device-side tracking path).

Mirror of tracking/kalman.py (the host tracker's numpy implementation,
itself parity with reference kalman_filter.py:40-270): same constant-
velocity model, std weights and Cholesky update, but expressed as fixed-
shape jnp ops batched over a padded track tensor (SURVEY.md §2.2
"batched-KF predict/update ... jax.scipy cho_factor/cho_solve via vmap").

Consumers: externally-computed predictions feed the host tracker via
``BYTETracker.update(predicted=...)`` instead of its numpy
``multi_predict`` (equivalence tested in tests/test_multistream.py).
The round-3 serving mode that ran ``predict`` inside the fused device
step was RETIRED in round 5 — it required depth-1 submit/fetch pairing
and pipelined host-KF serving beats it >2x (design note in
pipeline/multistream.py); these ops remain as the tested device twins
of tracking/kalman.py.

All functions take/return (N, 8) means and (N, 8, 8) covariances and are
safe under ``jax.jit``/``vmap``; padding rows just carry garbage states
that callers mask.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_STD_POS = 1.0 / 20
_STD_VEL = 1.0 / 160
_NDIM = 4


def _motion_mat() -> jnp.ndarray:
    f = jnp.eye(2 * _NDIM)
    return f.at[: _NDIM, _NDIM :].set(jnp.eye(_NDIM))


def initiate(measurements: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 4) xyah measurements -> (N, 8) means, (N, 8, 8) covariances."""
    n = measurements.shape[0]
    means = jnp.concatenate(
        [measurements, jnp.zeros((n, _NDIM), measurements.dtype)], axis=1
    )
    h = measurements[:, 3]
    std = jnp.stack(
        [
            2 * _STD_POS * h, 2 * _STD_POS * h, jnp.full_like(h, 1e-2),
            2 * _STD_POS * h, 10 * _STD_VEL * h, 10 * _STD_VEL * h,
            jnp.full_like(h, 1e-5), 10 * _STD_VEL * h,
        ],
        axis=1,
    )
    covs = jax.vmap(jnp.diag)(std ** 2)
    return means, covs


def predict(
    means: jnp.ndarray, covariances: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x' = Fx, P' = FPFᵀ + Q(h) for every track at once."""
    f = _motion_mat()
    h = means[:, 3]
    std = jnp.stack(
        [
            _STD_POS * h, _STD_POS * h, jnp.full_like(h, 1e-2), _STD_POS * h,
            _STD_VEL * h, _STD_VEL * h, jnp.full_like(h, 1e-5), _STD_VEL * h,
        ],
        axis=1,
    )
    q = jax.vmap(jnp.diag)(std ** 2)
    new_means = means @ f.T
    new_covs = jnp.einsum("ij,njk,lk->nil", f, covariances, f) + q
    return new_means, new_covs


def project(
    means: jnp.ndarray, covariances: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    h = means[:, 3]
    std = jnp.stack(
        [_STD_POS * h, _STD_POS * h, jnp.full_like(h, 1e-1), _STD_POS * h],
        axis=1,
    )
    r = jax.vmap(jnp.diag)(std ** 2)
    return means[:, :_NDIM], covariances[:, :_NDIM, :_NDIM] + r


def update(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    measurements: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched measurement update via vmapped Cholesky solves."""
    proj_means, proj_covs = project(means, covariances)
    pht = covariances[:, :, :_NDIM]  # H = [I 0]

    def solve(s, b):
        chol, lower = jax.scipy.linalg.cho_factor(s, lower=True)
        return jax.scipy.linalg.cho_solve((chol, lower), b)

    # gain K = P Hᵀ S⁻¹  computed as solve(S, (P Hᵀ)ᵀ)ᵀ
    gains = jax.vmap(
        lambda s, p: solve(s, p.T).T
    )(proj_covs, pht)
    innovation = measurements - proj_means
    new_means = means + jnp.einsum("nij,nj->ni", gains, innovation)
    new_covs = covariances - jnp.einsum(
        "nij,njk,nlk->nil", gains, proj_covs, gains
    )
    return new_means, new_covs


def gating_distance(
    means: jnp.ndarray,
    covariances: jnp.ndarray,
    measurements: jnp.ndarray,
) -> jnp.ndarray:
    """Squared Mahalanobis distance: (N tracks, M measurements)."""
    proj_means, proj_covs = project(means, covariances)

    def one(mean, cov):
        chol = jnp.linalg.cholesky(cov)
        d = measurements - mean  # (M, 4)
        z = jax.scipy.linalg.solve_triangular(chol, d.T, lower=True)
        return jnp.sum(z * z, axis=0)

    return jax.vmap(one)(proj_means, proj_covs)
