"""Metropolis-adjusted Langevin algorithm (reference: src/samplers/MALA.jl).

Proposal mean ``theta + (eps/2) grad``, Gaussian with variance ``eps``;
asymmetric q-ratio correction (MALA.jl:98-107).  Optional EmpMCTuner adapts
the drift step during burn-in (MALA.jl:36-43, 90-124).
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
class MALAState:
    pars: jnp.ndarray
    logtarget: jnp.ndarray
    grad: jnp.ndarray
    tune: TuneState
    i: jnp.ndarray


@dataclasses.dataclass(frozen=True, repr=False)
class MALA(Sampler):
    scale: float = 1.0  # driftStep
    tuner: Optional[EmpMCTuner] = None

    needs_gradient = True

    def __post_init__(self):
        assert self.scale > 0, "MALA drift step should be > 0"

    def init(self, model, theta0, key):
        lp, g = model.evalallg(theta0)
        return MALAState(
            pars=theta0, logtarget=lp, grad=g,
            tune=tuner_init(self.scale),
            i=jnp.asarray(1, dtype=jnp.int32),
        )

    def reset(self, model, state, theta):
        lp, g = model.evalallg(theta)
        return state.replace(pars=theta, logtarget=lp, grad=g)

    def step(self, model, ctx: RunCtx, state, key):
        k_prop, k_acc = jax.random.split(key)
        eps = state.tune.step_size if self.tuner is not None else jnp.asarray(
            self.scale, dtype=state.pars.dtype
        )
        eps = eps.astype(state.pars.dtype)

        pars_mean = state.pars + (eps / 2.0) * state.grad
        noise = jax.random.normal(k_prop, state.pars.shape, dtype=state.pars.dtype)
        proposed = pars_mean + jnp.sqrt(eps) * noise
        plp, pgrad = model.evalallg(proposed)

        log_norm = jnp.log(2.0 * jnp.pi * eps) / 2.0
        prob_new_given_old = jnp.sum(
            -((pars_mean - proposed) ** 2) / (2.0 * eps) - log_norm
        )
        rev_mean = proposed + (eps / 2.0) * pgrad
        prob_old_given_new = jnp.sum(
            -((rev_mean - state.pars) ** 2) / (2.0 * eps) - log_norm
        )

        ratio = plp + prob_old_given_new - state.logtarget - prob_new_given_old
        accept = metropolis_accept(k_acc, ratio)

        new_pars = jnp.where(accept, proposed, state.pars)
        new_lp = jnp.where(accept, plp, state.logtarget)
        new_grad = jnp.where(accept, pgrad, state.grad)

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
            MALAState(pars=new_pars, logtarget=new_lp, grad=new_grad, tune=tune,
                      i=state.i + 1),
            info,
        )
