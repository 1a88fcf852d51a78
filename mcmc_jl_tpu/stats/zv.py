"""Zero-variance MCMC estimators (reference: src/stats/zv.jl).

Mira, Solgi & Imparato (2013): post-process the chain with control variates
``z = -grad/2``.  ``linear_zv`` fits per-parameter OLS coefficients from the
covariance of ``[z, theta_i]`` (zv.jl:8-30); ``quadratic_zv`` uses the
k = p(p+3)/2 quadratic feature set including ``2 z .* theta - 1`` and cross
terms (zv.jl:33-68).  Requires the gradients table the chain carries
(MCMC.jl:60-68) — the reason gradient-based samplers store ``pgrads``.
"""
from __future__ import annotations

import numpy as np

from ..core.chain import MCMCChain


def _mats(chain, grad):
    if isinstance(chain, MCMCChain):
        assert not chain.gradients.empty, (
            "ZV estimators need stored gradients; run with a gradient-based sampler"
        )
        return (
            np.asarray(chain.samples.values, dtype=np.float64),
            np.asarray(chain.gradients.values, dtype=np.float64),
        )
    return np.asarray(chain, dtype=np.float64), np.asarray(grad, dtype=np.float64)


def linear_zv(chain, grad=None):
    x, g = _mats(chain, grad)
    npars = x.shape[1]
    z = -g / 2.0

    a = np.empty((npars, npars))
    for i in range(npars):
        cov_all = np.cov(np.column_stack([z, x[:, i]]), rowvar=False)
        precision = np.linalg.inv(cov_all[:npars, :npars])
        sigma = cov_all[:npars, npars]
        a[:, i] = -precision @ sigma

    return x + z @ a, a


def quadratic_zv(chain, grad=None):
    x, g = _mats(chain, grad)
    nsamples, npars = x.shape
    k = npars * (npars + 3) // 2
    z = -g / 2.0

    zq = np.empty((nsamples, k))
    zq[:, :npars] = z
    zq[:, npars : 2 * npars] = 2.0 * z * x - 1.0
    l = 2 * npars
    for i in range(npars - 1):
        for j in range(i + 1, npars):
            zq[:, l] = x[:, i] * z[:, j] + x[:, j] * z[:, i]
            l += 1

    a = np.empty((k, npars))
    for i in range(npars):
        cov_all = np.cov(np.column_stack([zq, x[:, i]]), rowvar=False)
        precision = np.linalg.inv(cov_all[:k, :k])
        sigma = cov_all[:k, k]
        a[:, i] = -precision @ sigma

    return x + zq @ a, a


# reference-spelling aliases (zv.jl exports linearZv / quadraticZv)
linearZv = linear_zv
quadraticZv = quadratic_zv
