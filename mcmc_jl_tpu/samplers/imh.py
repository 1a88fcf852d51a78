"""Independence Metropolis-Hastings (reference: src/samplers/IMH.jl).

Constructed either from a (log_candidate, rand_candidate) pair or from a
distribution object with ``logpdf``/``sample`` (the reference's
ContinuousMultivariateDistribution convenience ctor, IMH.jl:24-25).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..models.distributions import Distribution
from .base import RunCtx, Sampler, metropolis_accept, pytree_dataclass


@pytree_dataclass
class IMHState:
    pars: jnp.ndarray
    logtarget: jnp.ndarray
    logcandidate: jnp.ndarray
    i: jnp.ndarray


@dataclasses.dataclass(frozen=True, repr=False)
class IMH(Sampler):
    log_candidate: Callable = None
    rand_candidate: Callable = None  # key, shape -> draw

    def __init__(self, proposal=None, *, log_candidate=None, rand_candidate=None):
        if proposal is not None:
            assert isinstance(proposal, Distribution), (
                "IMH(proposal) expects a Distribution with logpdf/sample"
            )
            log_candidate = lambda p: jnp.sum(proposal.logpdf(p))  # noqa: E731
            rand_candidate = lambda key, shape: proposal.sample(key, shape)  # noqa: E731
        assert log_candidate is not None and rand_candidate is not None, (
            "IMH requires a proposal distribution or (log_candidate, rand_candidate)"
        )
        object.__setattr__(self, "log_candidate", log_candidate)
        object.__setattr__(self, "rand_candidate", rand_candidate)

    def init(self, model, theta0, key):
        return IMHState(
            pars=theta0,
            logtarget=model.eval(theta0),
            logcandidate=jnp.asarray(self.log_candidate(theta0)),
            i=jnp.asarray(1, dtype=jnp.int32),
        )

    def reset(self, model, state, theta):
        return state.replace(
            pars=theta, logtarget=model.eval(theta),
            logcandidate=jnp.asarray(self.log_candidate(theta)),
        )

    def step(self, model, ctx: RunCtx, state, key):
        k_prop, k_acc = jax.random.split(key)
        d = state.pars.shape[0]
        proposed = jnp.reshape(
            jnp.asarray(self.rand_candidate(k_prop, ()), dtype=state.pars.dtype), (-1,)
        )[:d]
        plp = model.eval(proposed)
        plc = jnp.asarray(self.log_candidate(proposed))

        # ratio includes candidate-density correction (IMH.jl:50)
        ratio = plp - state.logtarget - plc + state.logcandidate
        accept = metropolis_accept(k_acc, ratio)

        new_pars = jnp.where(accept, proposed, state.pars)
        new_lp = jnp.where(accept, plp, state.logtarget)
        new_lc = jnp.where(accept, plc, state.logcandidate)

        info = {
            "ppars": new_pars,
            "plogtarget": new_lp,
            "pars": state.pars,
            "logtarget": state.logtarget,
            "accept": accept,
        }
        return (
            IMHState(pars=new_pars, logtarget=new_lp, logcandidate=new_lc,
                     i=state.i + 1),
            info,
        )
