"""Random-walk Metropolis (reference: src/samplers/RWM.jl).

Proposal: isotropic Gaussian scaled by ``model.scale .* sampler.scale``
(RWM.jl:52,59); accept via the shared Metropolis test (RWM.jl:63).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .base import Sampler, RunCtx, metropolis_accept, pytree_dataclass


@pytree_dataclass
class RWMState:
    pars: jnp.ndarray
    logtarget: jnp.ndarray
    i: jnp.ndarray


@dataclasses.dataclass(frozen=True, repr=False)
class RWM(Sampler):
    scale: float = 1.0
    tuner: object = None  # RWMTuner is abstract-only in the reference (RWM.jl:18)

    def __post_init__(self):
        assert self.scale > 0, "scale should be > 0"

    def init(self, model, theta0, key):
        return RWMState(
            pars=theta0,
            logtarget=model.eval(theta0),
            i=jnp.asarray(1, dtype=jnp.int32),
        )

    def reset(self, model, state, theta):
        return state.replace(pars=theta, logtarget=model.eval(theta))

    def step(self, model, ctx: RunCtx, state, key):
        k_prop, k_acc = jax.random.split(key)
        scale = model.scale * self.scale
        proposed = state.pars + jax.random.normal(k_prop, state.pars.shape,
                                                  dtype=state.pars.dtype) * scale
        plogtarget = model.eval(proposed)

        ratio = plogtarget - state.logtarget
        accept = metropolis_accept(k_acc, ratio)

        new_pars = jnp.where(accept, proposed, state.pars)
        new_lp = jnp.where(accept, plogtarget, state.logtarget)

        info = {
            "ppars": new_pars,
            "plogtarget": new_lp,
            "pars": state.pars,
            "logtarget": state.logtarget,
            "accept": accept,
        }
        return RWMState(pars=new_pars, logtarget=new_lp, i=state.i + 1), info
