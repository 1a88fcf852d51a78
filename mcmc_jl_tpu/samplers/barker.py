"""Barker proposal MCMC (Livingstone & Zanella 2022, JRSS-B).

No reference equivalent (capability beyond dingliumath/MCMC.jl's 13
kernels): a gradient-based proposal that is robust to step-size
mis-tuning and scale heterogeneity — the acceptance rate degrades
gracefully (like RWM) while retaining gradient-guided drift (like MALA).

Mechanism, per coordinate i:

    z_i ~ N(0, (scale_i)^2);  b_i = +1 w.p. sigmoid(z_i * grad_i) else -1
    proposal  y = x + b * z

The increment density telescopes to ``q(y|x) = 2 N(w) sigmoid(w*grad(x))``
for ``w = y - x``, giving the exact MH correction

    log r = logp(y) - logp(x)
          + sum_i [ softplus(-w_i g_i(x)) - softplus(w_i g_i(y)) ]

(the Gaussian parts cancel; only the Bernoulli skewing corrects).  Follows
the sampler protocol of samplers/base.py; proposal scale multiplies
``model.scale`` like the reference's RWM (RWM.jl:52); optional
``EmpMCTuner`` burn-in adaptation toward the Barker-optimal acceptance
rate ~0.57.
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
class BarkerState:
    pars: jnp.ndarray
    logtarget: jnp.ndarray
    grad: jnp.ndarray
    tune: TuneState
    i: jnp.ndarray


@dataclasses.dataclass(frozen=True, repr=False)
class Barker(Sampler):
    scale: float = 1.0
    tuner: Optional[EmpMCTuner] = None

    needs_gradient = True

    def __post_init__(self):
        assert self.scale > 0, "Barker proposal scale should be > 0"

    def init(self, model, theta0, key):
        lp, g = model.evalallg(theta0)
        return BarkerState(
            pars=theta0, logtarget=lp, grad=g,
            tune=tuner_init(self.scale),
            i=jnp.asarray(1, dtype=jnp.int32),
        )

    def reset(self, model, state, theta):
        lp, g = model.evalallg(theta)
        return state.replace(pars=theta, logtarget=lp, grad=g)

    def step(self, model, ctx: RunCtx, state, key):
        k_z, k_b, k_acc = jax.random.split(key, 3)
        eps = state.tune.step_size if self.tuner is not None else jnp.asarray(
            self.scale, dtype=state.pars.dtype
        )
        sigma = eps.astype(state.pars.dtype) * model.scale

        z = sigma * jax.random.normal(k_z, state.pars.shape,
                                      dtype=state.pars.dtype)
        p_plus = jax.nn.sigmoid(z * state.grad)
        u = jax.random.uniform(k_b, state.pars.shape, dtype=state.pars.dtype)
        w = jnp.where(u < p_plus, z, -z)
        proposed = state.pars + w
        plp, pgrad = model.evalallg(proposed)

        correction = jnp.sum(
            jax.nn.softplus(-w * state.grad) - jax.nn.softplus(w * pgrad)
        )
        ratio = plp - state.logtarget + correction
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
            BarkerState(pars=new_pars, logtarget=new_lp, grad=new_grad,
                        tune=tune, i=state.i + 1),
            info,
        )
