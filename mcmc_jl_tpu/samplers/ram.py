"""Robust adaptive Metropolis (Vihola 2012) — reference: src/samplers/RAM.jl.

Proposal ``theta + S r`` with lower-triangular factor ``S`` updated every
step (adaptation is always-on, not burn-in gated — RAM.jl:73-79):

    eta = min(1, d * i^(-2/3))
    SS  = S (I + eta (min(1, e^ratio) - target_rate) r r' / |r|^2) S'
    S   = chol(SS)  (lower)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .base import RunCtx, Sampler, metropolis_accept, pytree_dataclass


@pytree_dataclass
class RAMState:
    pars: jnp.ndarray
    logtarget: jnp.ndarray
    S: jnp.ndarray
    i: jnp.ndarray


@dataclasses.dataclass(frozen=True, repr=False)
class RAM(Sampler):
    scale: float = 1.0
    rate: float = 0.234

    def __post_init__(self):
        assert self.scale > 0, "scale should be > 0"
        assert 0.0 < self.rate < 1.0, (
            f"target acceptance rate ({self.rate}) should be between 0 and 1"
        )

    def init(self, model, theta0, key):
        scale = model.scale * self.scale
        return RAMState(
            pars=theta0,
            logtarget=model.eval(theta0),
            S=jnp.diag(scale.astype(theta0.dtype)),
            i=jnp.asarray(1, dtype=jnp.int32),
        )

    def reset(self, model, state, theta):
        return state.replace(pars=theta, logtarget=model.eval(theta))

    def step(self, model, ctx: RunCtx, state, key):
        k_prop, k_acc = jax.random.split(key)
        d = state.pars.shape[0]
        rvec = jax.random.normal(k_prop, (d,), dtype=state.pars.dtype)
        proposed = state.pars + state.S @ rvec
        plp = model.eval(proposed)

        ratio = plp - state.logtarget
        accept = metropolis_accept(k_acc, ratio)

        new_pars = jnp.where(accept, proposed, state.pars)
        new_lp = jnp.where(accept, plp, state.logtarget)

        # --- scale tuning (RAM.jl:73-79) ---------------------------------
        eta = jnp.minimum(1.0, d * state.i.astype(rvec.dtype) ** (-2.0 / 3.0))
        alpha = jnp.where(jnp.isnan(ratio), 0.0, jnp.minimum(1.0, jnp.exp(ratio)))
        outer = jnp.outer(rvec, rvec) / jnp.dot(rvec, rvec)
        SS = state.S @ (
            jnp.eye(d, dtype=rvec.dtype) + eta * (alpha - self.rate) * outer
        ) @ state.S.T
        S_new = jnp.linalg.cholesky(SS)
        # keep the previous factor if the update lost positive-definiteness
        S_new = jnp.where(jnp.all(jnp.isfinite(S_new)), S_new, state.S)

        info = {
            "ppars": new_pars,
            "plogtarget": new_lp,
            "pars": state.pars,
            "logtarget": state.logtarget,
            "accept": accept,
            "scale": jnp.trace(state.S),  # RAM.jl:65 stores trace(S)
        }
        return (
            RAMState(pars=new_pars, logtarget=new_lp, S=S_new, i=state.i + 1),
            info,
        )
