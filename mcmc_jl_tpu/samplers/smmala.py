"""Simplified manifold MALA (reference: src/samplers/SMMALA.jl).

Drift ``(eps/2) G^{-1} grad``, proposal covariance ``eps G^{-1}`` via its
Cholesky factor, position-dependent q-ratio with log-det terms
(SMMALA.jl:81-100).  Requires gradient + metric tensor.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .base import (
    EmpMCTuner, RunCtx, Sampler, TuneState, metropolis_accept,
    pytree_dataclass, tuner_init, tuner_update,
)


@pytree_dataclass
class SMMALAState:
    pars: jnp.ndarray
    logtarget: jnp.ndarray
    grad: jnp.ndarray
    G: jnp.ndarray
    tune: TuneState
    i: jnp.ndarray


def _logdet_chol(L):
    return jnp.sum(jnp.log(jnp.diagonal(L)))


@dataclasses.dataclass(frozen=True, repr=False)
class SMMALA(Sampler):
    scale: float = 1.0  # driftStep
    tuner: Optional[EmpMCTuner] = None

    needs_gradient = True
    needs_tensor = True

    def __post_init__(self):
        assert self.scale > 0, "SMMALA drift step should be > 0"

    def init(self, model, theta0, key):
        lp, g, G = model.evalallt(theta0)
        return SMMALAState(
            pars=theta0, logtarget=lp, grad=g, G=G,
            tune=tuner_init(self.scale),
            i=jnp.asarray(1, dtype=jnp.int32),
        )

    def reset(self, model, state, theta):
        lp, g, G = model.evalallt(theta)
        return state.replace(pars=theta, logtarget=lp, grad=g, G=G)

    def step(self, model, ctx: RunCtx, state, key):
        k_prop, k_acc = jax.random.split(key)
        dtype = state.pars.dtype
        eps = (
            state.tune.step_size.astype(dtype)
            if self.tuner is not None
            else jnp.asarray(self.scale, dtype=dtype)
        )

        invG = jnp.linalg.inv(state.G)
        first_term = invG @ state.grad
        pars_mean = state.pars + (eps / 2.0) * first_term

        # lower Cholesky of eps*G^{-1} (Julia chol(...)' in SMMALA.jl:84)
        L = jnp.linalg.cholesky(eps * invG)
        noise = jax.random.normal(k_prop, state.pars.shape, dtype=dtype)
        proposed = pars_mean + L @ noise

        plp, pgrad, pG = model.evalallt(proposed)

        diff = pars_mean - proposed
        prob_new_given_old = -_logdet_chol(L) - 0.5 * diff @ (state.G / eps) @ diff

        p_invG = jnp.linalg.inv(pG)
        p_first_term = p_invG @ pgrad
        rev_mean = proposed + (eps / 2.0) * p_first_term
        pL = jnp.linalg.cholesky(eps * p_invG)
        rdiff = rev_mean - state.pars
        prob_old_given_new = -_logdet_chol(pL) - 0.5 * rdiff @ (pG / eps) @ rdiff

        ratio = plp + prob_old_given_new - state.logtarget - prob_new_given_old
        accept = metropolis_accept(k_acc, ratio)

        new_pars = jnp.where(accept, proposed, state.pars)
        new_lp = jnp.where(accept, plp, state.logtarget)
        new_grad = jnp.where(accept, pgrad, state.grad)
        new_G = jnp.where(accept, pG, state.G)

        tune = tuner_update(self.tuner, state.tune, state.i, accept, ctx.burnin)

        info = {
            "ppars": new_pars,
            "plogtarget": new_lp,
            "pgrads": new_grad,
            "pars": state.pars,
            "logtarget": state.logtarget,
            "grads": state.grad,
            "accept": accept,
        }
        return (
            SMMALAState(pars=new_pars, logtarget=new_lp, grad=new_grad, G=new_G,
                        tune=tune, i=state.i + 1),
            info,
        )
