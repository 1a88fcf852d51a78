"""Cross-chain diagnostics.

The reference is single-chain-only (its prun chains never interact and its
stats take one MCMCChain).  With thousands of vmapped chains, cross-chain
diagnostics are both natural and cheap on device:

- :func:`rhat` — split-chain potential scale reduction (Gelman-Rubin)
- :func:`ess_pooled` — rank-free pooled ESS: per-chain Geyer ESS summed
- :func:`summarize_chains` — one host-side report for a (steps, chains, d)
  sample block from :func:`mcmc_jl_tpu.parallel.run_chains`
"""
from __future__ import annotations

import numpy as np

from .var import mcvar_iid, mcvar_imse


def _as_block(x):
    """Accept (steps, chains, d) arrays or run_chains infos dicts."""
    if isinstance(x, dict):
        x = x["ppars"]
    x = np.asarray(x, dtype=np.float64)
    assert x.ndim == 3, f"expected (steps, chains, d), got {x.shape}"
    return x


def rhat(x, split: bool = True):
    """Split-R-hat per parameter for a (steps, chains, d) block."""
    x = _as_block(x)
    n, m, d = x.shape
    if split and n >= 2:
        half = n // 2
        x = np.concatenate([x[:half], x[half : 2 * half]], axis=1)
        n, m, d = x.shape
    chain_means = x.mean(axis=0)  # (m, d)
    W = x.var(axis=0, ddof=1).mean(axis=0)  # (d,)
    B = n * chain_means.var(axis=0, ddof=1)  # (d,)
    var_plus = (n - 1) / n * W + B / n
    return np.sqrt(var_plus / W)


def ess_pooled(x):
    """Sum of per-chain Geyer-IMSE ESS, per parameter."""
    x = _as_block(x)
    n, m, d = x.shape
    out = np.zeros(d)
    for c in range(m):
        out += n * mcvar_iid(x[:, c]) / mcvar_imse(x[:, c])
    return out


def summarize_chains(x, param_names=None):
    """Host-side cross-chain report: mean, sd, MCSE, pooled ESS, R-hat."""
    x = _as_block(x)
    n, m, d = x.shape
    names = param_names or [f"pars.{i + 1}" for i in range(d)]
    flat = x.reshape(n * m, d)
    ess = ess_pooled(x)
    rep = {}
    for i, name in enumerate(names):
        rep[name] = {
            "mean": float(flat[:, i].mean()),
            "sd": float(flat[:, i].std(ddof=1)),
            "mcse": float(flat[:, i].std(ddof=1) / np.sqrt(max(ess[i], 1.0))),
            "ess": float(ess[i]),
            "rhat": float(rhat(x)[i]),
        }
    return rep
