"""Marginal-likelihood (log-evidence) estimators from power-posterior runs.

No reference equivalent (dingliumath/MCMC.jl has no evidence machinery);
this builds on the PTMC runner's prior-tempered ladders
(``PTMC(logprior=...)``, runners/ptmc.py), whose ``replica_ll``
diagnostic holds per-rung log-likelihood draws ``ll[t, k]`` from the power
posterior ``p_k(theta) ∝ prior(theta) * lik(theta)^beta_k``.

Estimators:

- :func:`logz_ti` — thermodynamic integration (path sampling) with the
  variance-corrected trapezoid of Friel & Pettitt (2008) /
  Friel, Hurn & Wyse (2014):
  ``log Z = ∫_0^1 E_beta[log L] dbeta
  ≈ Σ Δβ (m_k + m_{k+1})/2 − Δβ² (v_{k+1} − v_k)/12``.
- :func:`logz_ss` — stepping-stone sampling (Xie et al. 2011):
  ``log Z = Σ_k log (1/n) Σ_t exp((β_{k+1} − β_k) ll[t, k])``,
  a telescoped importance-sampling product that needs ``β_0 = 0`` (draws
  from the prior) to be unbiased for the full evidence.

Both run on host numpy: inputs are the already-gathered (steps, K) draws.
"""
from __future__ import annotations

import numpy as np


def _ll_betas(chain_or_ll, betas, burnin):
    if betas is None:
        d = chain_or_ll.diagnostics
        if "replica_ll" not in d or "betas" not in d:
            raise ValueError(
                "chain has no replica_ll/betas diagnostics — run it with "
                "PTMC(logprior=...)"
            )
        ll, betas = d["replica_ll"], d["betas"]
    else:
        ll = chain_or_ll
    ll = np.asarray(ll, dtype=np.float64)
    betas = np.asarray(betas, dtype=np.float64)
    assert ll.ndim == 2 and ll.shape[1] == betas.shape[0], (
        f"ll {ll.shape} vs betas {betas.shape}"
    )
    assert 0 <= burnin < ll.shape[0]
    return ll[burnin:], betas


def logz_ti(chain_or_ll, betas=None, burnin=0):
    """Thermodynamic-integration log-evidence (corrected trapezoid).

    ``chain_or_ll``: an MCMCChain from ``run(model * s * PTMC(logprior=...))``
    or a raw (steps, K) array of per-rung log-likelihood draws (then pass
    ``betas``).  ``burnin`` rows are discarded first.

    For an unbiased estimate the ladder should start at beta=0; with
    beta_0 > 0 the integral over [0, beta_0) is simply missing."""
    ll, betas = _ll_betas(chain_or_ll, betas, burnin)
    m = ll.mean(axis=0)
    v = ll.var(axis=0)
    db = np.diff(betas)
    return float(np.sum(db * (m[1:] + m[:-1]) / 2.0)
                 - np.sum(db ** 2 * (v[1:] - v[:-1]) / 12.0))


def logz_ss(chain_or_ll, betas=None, burnin=0):
    """Stepping-stone log-evidence (Xie et al. 2011).

    Uses draws from rung k to bridge beta_k -> beta_{k+1}; requires
    beta_0 = 0 (prior draws) for the product to telescope to Z(1)/Z(0)=Z."""
    ll, betas = _ll_betas(chain_or_ll, betas, burnin)
    if betas[0] != 0.0:
        raise ValueError(
            "stepping-stone needs beta_0 = 0 (draws from the prior); "
            f"got beta_0 = {betas[0]}"
        )
    db = np.diff(betas)
    n = ll.shape[0]
    # log-mean-exp per stone, stabilized by the max
    w = db[None, :] * ll[:, :-1]
    mx = w.max(axis=0)
    return float(np.sum(mx + np.log(np.mean(np.exp(w - mx), axis=0))))
