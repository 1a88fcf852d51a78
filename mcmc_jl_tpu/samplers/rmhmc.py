"""Riemannian manifold HMC (reference: src/samplers/RMHMC.jl; Girolami &
Calderhead 2011).

Generalized leapfrog with ``n_newton`` fixed-point iterations for the
implicit momentum and position updates (RMHMC.jl:120-155), randomized
integration direction and trajectory length ``ceil(rand()*n_leaps)``
(RMHMC.jl:117-118), Hamiltonian with the ``log det G`` volume term
(RMHMC.jl:107).  Requires gradient + tensor + dtensor.  (The reference
header marks its version "work in progress"; this implementation completes
the algorithm with a fair +-1 direction draw.)
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
from .smmala import chol_inverse


@pytree_dataclass
class RMHMCState:
    pars: jnp.ndarray
    logtarget: jnp.ndarray
    grad: jnp.ndarray
    # metric at pars, carried across transitions (round 5): the reference
    # re-evaluates the tensor at the current point every step
    # (RMHMC.jl:104-107); it was already computed when this point was the
    # proposal, so carrying it saves one evalt per transition
    G: jnp.ndarray
    tune: TuneState
    i: jnp.ndarray


def _metric_pack(invG, dG):
    """invGxdG[:, :, j] = invG @ dG[:, :, j]; trace of each (RMHMC.jl:110-113)."""
    invGxdG = jnp.einsum("ab,bcj->acj", invG, dG)
    traces = jnp.trace(invGxdG, axis1=0, axis2=1)
    return invGxdG, traces


def _momentum_term(m, invGxdG, invG_m):
    """mt[r] = 0.5 * m' invGxdG[:, :, r] invG m (RMHMC.jl:126-129)."""
    return 0.5 * jnp.einsum("a,abr,b->r", m, invGxdG, invG_m)


@dataclasses.dataclass(frozen=True, repr=False)
class RMHMC(Sampler):
    n_leaps: int = 6
    leap_step: float = 0.5
    n_newton: int = 4
    tuner: Optional[EmpMCTuner] = None

    needs_gradient = True
    needs_tensor = True
    needs_dtensor = True

    def __init__(self, *args, n_leaps=None, leap_step=None, n_newton=None, tuner=None):
        """Reference ctor overloads (RMHMC.jl:43-50): ``RMHMC()``,
        ``RMHMC(nLeaps)`` (leapStep=3/nLeaps), ``RMHMC(leapStep)``
        (nLeaps=floor(3/leapStep)), ``RMHMC(nLeaps, leapStep)``, plus
        optional ``nNewton`` int and trailing tuner."""
        pos = list(args)
        if pos and isinstance(pos[-1], EmpMCTuner):
            assert tuner is None
            tuner = pos.pop()
        ints = [a for a in pos if isinstance(a, int)]
        floats = [a for a in pos if isinstance(a, float)]
        if n_leaps is None and ints:
            n_leaps = ints.pop(0)
        if n_newton is None and ints:
            n_newton = ints.pop(0)
        if leap_step is None and floats:
            leap_step = floats.pop(0)
        if n_leaps is None and leap_step is not None:
            n_leaps = max(1, int(3.0 / leap_step))
        if leap_step is None and n_leaps is not None and n_leaps != 6:
            leap_step = 3.0 / n_leaps
        n_leaps = 6 if n_leaps is None else n_leaps
        leap_step = 0.5 if leap_step is None else leap_step
        n_newton = 4 if n_newton is None else n_newton
        assert n_leaps > 0, "Number of leapfrog steps should be > 0"
        assert leap_step > 0, "Leapfrog step size should be > 0"
        assert n_newton > 0, "Number of Newton steps should be > 0"
        object.__setattr__(self, "n_leaps", int(n_leaps))
        object.__setattr__(self, "leap_step", float(leap_step))
        object.__setattr__(self, "n_newton", int(n_newton))
        object.__setattr__(self, "tuner", tuner)

    def init(self, model, theta0, key):
        lp, g, G = model.evalallt(theta0)
        return RMHMCState(
            pars=theta0, logtarget=lp, grad=g, G=G,
            tune=tuner_init(self.leap_step, self.n_leaps),
            i=jnp.asarray(1, dtype=jnp.int32),
        )

    def reset(self, model, state, theta):
        lp, g, G = model.evalallt(theta)
        return state.replace(pars=theta, logtarget=lp, grad=g, G=G)

    def step(self, model, ctx: RunCtx, state, key):
        k_mom, k_dir, k_len, k_acc = jax.random.split(key, 4)
        dtype = state.pars.dtype
        d = state.pars.shape[0]
        if self.tuner is not None:
            eps = state.tune.step_size.astype(dtype)
            nl = state.tune.n_leaps
        else:
            eps = jnp.asarray(self.leap_step, dtype=dtype)
            nl = jnp.asarray(self.n_leaps, dtype=jnp.int32)

        G0 = state.G  # carried from the last accept (see RMHMCState)
        cholG0 = jnp.linalg.cholesky(G0)
        invG0 = chol_inverse(cholG0)
        m0 = cholG0 @ jax.random.normal(k_mom, (d,), dtype=dtype)
        # log det term spelled as in RMHMC.jl:107 (constant cancels in ratio)
        logdet_term0 = 0.5 * (
            jnp.log(2.0) + d * jnp.log(jnp.pi)
            + 2.0 * jnp.sum(jnp.log(jnp.diagonal(cholG0)))
        )
        H0 = -state.logtarget + logdet_term0 + 0.5 * m0 @ invG0 @ m0

        dG0 = model.evaldt(state.pars)
        invGxdG0, traces0 = _metric_pack(invG0, dG0)

        time_step = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0).astype(dtype)
        n_rand = jnp.ceil(
            jax.random.uniform(k_len, (), dtype=dtype) * nl.astype(dtype)
        ).astype(jnp.int32)
        half = time_step * (eps / 2.0)

        def leap(j, carry):
            pars, m, G, invG, invGxdG, traces = carry

            # implicit momentum half-step (fixed point, RMHMC.jl:123-131)
            leap_grad = model.evalg(pars)
            lm = m
            for _ in range(self.n_newton):
                invG_lm = invG @ lm
                mt = _momentum_term(lm, invGxdG, invG_lm)
                lm = m + half * (leap_grad - 0.5 * traces + mt)
            m = lm
            invG_m2 = invG @ m

            # implicit position step (fixed point, RMHMC.jl:136-141)
            lp_pars = pars
            for _ in range(self.n_newton):
                Gk = model.evalt(lp_pars)
                invG_m1 = jnp.linalg.solve(Gk, m)
                lp_pars = pars + half * (invG_m1 + invG_m2)
            pars = lp_pars

            # refresh metric and finish momentum step (RMHMC.jl:143-156)
            G = model.evalt(pars)
            invG = chol_inverse(jnp.linalg.cholesky(G))
            dG = model.evaldt(pars)
            invGxdG, traces = _metric_pack(invG, dG)
            invG_m = invG @ m
            mt = _momentum_term(m, invGxdG, invG_m)
            pgrad = model.evalg(pars)
            m = m + half * (pgrad - 0.5 * traces + mt)
            return pars, m, G, invG, invGxdG, traces

        pars, m, G, invG, _, _ = jax.lax.fori_loop(
            0, n_rand, leap, (state.pars, m0, G0, invG0, invGxdG0, traces0)
        )

        plp = model.eval(pars)
        pgrad = model.evalg(pars)
        cholG = jnp.linalg.cholesky(G)
        logdet_term = 0.5 * (
            jnp.log(2.0) + d * jnp.log(jnp.pi)
            + 2.0 * jnp.sum(jnp.log(jnp.diagonal(cholG)))
        )
        pH = -plp + logdet_term + 0.5 * m @ invG @ m

        ratio = H0 - pH
        accept = metropolis_accept(k_acc, ratio)

        new_pars = jnp.where(accept, pars, state.pars)
        new_lp = jnp.where(accept, plp, state.logtarget)
        new_grad = jnp.where(accept, pgrad, state.grad)
        new_G = jnp.where(accept, G, G0)

        tune = tuner_update(self.tuner, state.tune, state.i, accept, ctx.burnin,
                            with_leaps=True)

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
            RMHMCState(pars=new_pars, logtarget=new_lp, grad=new_grad,
                       G=new_G, tune=tune, i=state.i + 1),
            info,
        )
