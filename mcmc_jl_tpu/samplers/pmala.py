"""Position-dependent MALA (reference: src/samplers/PMALA.jl; Xifara et al.
2013).

Like SMMALA but the drift subtracts the metric-derivative correction
``sum_i (G^{-1} dG_i G^{-1})_{:, i}`` (PMALA.jl:77-80, 94).  Requires
gradient + tensor + dtensor.
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
from .smmala import _logdet_chol


@pytree_dataclass
class PMALAState:
    pars: jnp.ndarray
    logtarget: jnp.ndarray
    grad: jnp.ndarray
    G: jnp.ndarray
    dG: jnp.ndarray
    tune: TuneState
    i: jnp.ndarray


def _drift_terms(grad, G, dG):
    """(G^{-1} grad, sum_i (G^{-1} dG_i G^{-1})_{:, i}) — PMALA.jl:76-80."""
    invG = jnp.linalg.inv(G)
    first = invG @ grad
    # second[:, i] = (invG @ dG[:, :, i]) @ invG[:, i]; summed over i
    second = jnp.einsum("ab,bci,ci->a", invG, dG, invG)
    return invG, first, second


@dataclasses.dataclass(frozen=True, repr=False)
class PMALA(Sampler):
    scale: float = 1.0  # driftStep
    tuner: Optional[EmpMCTuner] = None

    needs_gradient = True
    needs_tensor = True
    needs_dtensor = True

    def __post_init__(self):
        assert self.scale > 0, "PMALA drift step should be > 0"

    def init(self, model, theta0, key):
        lp, g, G, dG = model.evalalldt(theta0)
        return PMALAState(
            pars=theta0, logtarget=lp, grad=g, G=G, dG=dG,
            tune=tuner_init(self.scale),
            i=jnp.asarray(1, dtype=jnp.int32),
        )

    def reset(self, model, state, theta):
        lp, g, G, dG = model.evalalldt(theta)
        return state.replace(pars=theta, logtarget=lp, grad=g, G=G, dG=dG)

    def step(self, model, ctx: RunCtx, state, key):
        k_prop, k_acc = jax.random.split(key)
        dtype = state.pars.dtype
        eps = (
            state.tune.step_size.astype(dtype)
            if self.tuner is not None
            else jnp.asarray(self.scale, dtype=dtype)
        )

        invG, first, second = _drift_terms(state.grad, state.G, state.dG)
        pars_mean = state.pars + (eps / 2.0) * (first - second)

        L = jnp.linalg.cholesky(eps * invG)
        noise = jax.random.normal(k_prop, state.pars.shape, dtype=dtype)
        proposed = pars_mean + L @ noise

        plp, pgrad, pG, pdG = model.evalalldt(proposed)

        diff = pars_mean - proposed
        prob_new_given_old = -_logdet_chol(L) - 0.5 * diff @ (state.G / eps) @ diff

        p_invG, p_first, p_second = _drift_terms(pgrad, pG, pdG)
        rev_mean = proposed + (eps / 2.0) * (p_first - p_second)
        pL = jnp.linalg.cholesky(eps * p_invG)
        rdiff = rev_mean - state.pars
        prob_old_given_new = -_logdet_chol(pL) - 0.5 * rdiff @ (pG / eps) @ rdiff

        ratio = plp + prob_old_given_new - state.logtarget - prob_new_given_old
        accept = metropolis_accept(k_acc, ratio)

        new_pars = jnp.where(accept, proposed, state.pars)
        new_lp = jnp.where(accept, plp, state.logtarget)
        new_grad = jnp.where(accept, pgrad, state.grad)
        new_G = jnp.where(accept, pG, state.G)
        new_dG = jnp.where(accept, pdG, state.dG)

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
            PMALAState(pars=new_pars, logtarget=new_lp, grad=new_grad, G=new_G,
                       dG=new_dG, tune=tune, i=state.i + 1),
            info,
        )
