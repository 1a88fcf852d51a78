"""Lagrangian Monte Carlo samplers (Lan et al. 2012).

- :class:`ERMLMC` — explicit Riemannian manifold Lagrangian MC
  (reference: src/samplers/ERMLMC.jl): semi-implicit velocity solves
  ``(G + h/2 vxC) v' = G v - h/2 dphi`` and a ``deltaLogDet`` volume
  correction accumulated into the acceptance ratio (ERMLMC.jl:109-158).
- :class:`RMLMC` — semi-explicit variant (reference: src/samplers/RMLMC.jl):
  fixed-point velocity iteration with ``n_newton`` sweeps
  (RMLMC.jl:119-152); its energy's ``log det`` term enters with the
  opposite sign to ERMLMC (RMLMC.jl:110 vs ERMLMC.jl:105 — SURVEY §2.3).

Both require gradient + tensor + dtensor.  Shared geometry:
``C = 0.5*(perm(dG,[3 2 1]) + perm(dG,[1 3 2]) - dG)`` (Christoffel-like,
ERMLMC.jl:80) and ``dphi = -grad + 0.5 trace(G^{-1} dG_k)`` (ERMLMC.jl:79).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from jax.scipy.linalg import solve_triangular

from .base import (
    EmpMCTuner, RunCtx, Sampler, TuneState, metropolis_accept,
    pytree_dataclass, tuner_init, tuner_update,
)
from .smmala import chol_inverse


@pytree_dataclass
class LMCState:
    pars: jnp.ndarray
    logtarget: jnp.ndarray
    grad: jnp.ndarray
    # full geometry at pars, carried across transitions (round 5): the
    # reference recomputes inv/chol/Christoffel terms at the current point
    # every step (ERMLMC.jl:74-84); they were already computed when this
    # point was the proposal
    G: jnp.ndarray
    invG: jnp.ndarray
    cholG: jnp.ndarray
    dphi: jnp.ndarray
    C: jnp.ndarray
    tune: TuneState
    i: jnp.ndarray


def _geometry(grad, G, dG):
    """(invG, cholG, dphi, C) from the metric and its derivative (one
    Cholesky; the inverse via triangular solves)."""
    cholG = jnp.linalg.cholesky(G)
    invG = chol_inverse(cholG)
    traces = jnp.einsum("ab,baj->j", invG, dG)  # trace(invG dG_j)
    dphi = -grad + 0.5 * traces
    C = 0.5 * (
        jnp.transpose(dG, (2, 1, 0)) + jnp.transpose(dG, (0, 2, 1)) - dG
    )
    return invG, cholG, dphi, C


def _vxC(v, C):
    """vxC[k, :] = v' C[:, :, k] (ERMLMC.jl:113-115)."""
    return jnp.einsum("a,abk->kb", v, C)


def _slogdet(M):
    _, ld = jnp.linalg.slogdet(M)
    return ld


class _LagrangianBase(Sampler):
    needs_gradient = True
    needs_tensor = True
    needs_dtensor = True

    def init(self, model, theta0, key):
        lp, g, G, dG = model.evalalldt(theta0)
        invG, cholG, dphi, C = _geometry(g, G, dG)
        return LMCState(
            pars=theta0, logtarget=lp, grad=g, G=G, invG=invG, cholG=cholG,
            dphi=dphi, C=C,
            tune=tuner_init(self.leap_step, self.n_leaps),
            i=jnp.asarray(1, dtype=jnp.int32),
        )

    def reset(self, model, state, theta):
        lp, g, G, dG = model.evalalldt(theta)
        invG, cholG, dphi, C = _geometry(g, G, dG)
        return state.replace(pars=theta, logtarget=lp, grad=g, G=G,
                             invG=invG, cholG=cholG, dphi=dphi, C=C)

    def _energy_logdet_sign(self):
        raise NotImplementedError

    def _velocity_update(self, model, carry, half, h):
        raise NotImplementedError

    def step(self, model, ctx: RunCtx, state, key):
        k_vel, k_len, k_acc = jax.random.split(key, 3)
        dtype = state.pars.dtype
        d = state.pars.shape[0]
        if self.tuner is not None:
            h = state.tune.step_size.astype(dtype)
            nl = state.tune.n_leaps
        else:
            h = jnp.asarray(self.leap_step, dtype=dtype)
            nl = jnp.asarray(self.n_leaps, dtype=jnp.int32)

        # geometry at the current point carried from the last accept
        invG0, cholG0, dphi0, C0 = state.invG, state.cholG, state.dphi, state.C
        sgn = self._energy_logdet_sign()

        # velocity ~ N(0, G^{-1}) (ERMLMC.jl:103) via L^{-T} z
        v0 = solve_triangular(
            cholG0.T, jax.random.normal(k_vel, (d,), dtype=dtype),
            lower=False)
        E0 = (
            -state.logtarget
            + sgn * jnp.sum(jnp.log(jnp.diagonal(cholG0)))
            + 0.5 * v0 @ state.G @ v0
        )

        n_rand = jnp.ceil(
            jax.random.uniform(k_len, (), dtype=dtype) * nl.astype(dtype)
        ).astype(jnp.int32)

        def leap(j, carry):
            (pars, lp, grad, G, invG, cholG, dphi, C, v, dld) = carry

            v, dld = self._velocity_update(model, (G, invG, dphi, C, v), dld, h)

            pars = pars + h * v
            lp, grad, G, dG = model.evalalldt(pars)
            invG, cholG, dphi, C = _geometry(grad, G, dG)

            # closing velocity half-update
            vxc = _vxC(v, C)
            if isinstance(self, ERMLMC):
                dld = dld - _slogdet(G + (0.5 * h) * vxc)
                v = jnp.linalg.solve(
                    G + (0.5 * h) * vxc, G @ v - (0.5 * h) * dphi
                )
                vxc = _vxC(v, C)
                dld = dld + _slogdet(G - (0.5 * h) * vxc)
            else:  # RMLMC (RMLMC.jl:145-152)
                dld = dld + _slogdet(G - h * vxc)
                v = v - (0.5 * h) * invG @ (vxc @ v + dphi)
            return (pars, lp, grad, G, invG, cholG, dphi, C, v, dld)

        init = (
            state.pars, state.logtarget, state.grad, state.G,
            invG0, cholG0, dphi0, C0, v0, jnp.asarray(0.0, dtype=dtype),
        )
        (pars, lp, grad, G, invG, cholG, dphi, C, v, dld) = jax.lax.fori_loop(
            0, n_rand, leap, init
        )

        pE = -lp + sgn * jnp.sum(jnp.log(jnp.diagonal(cholG))) + 0.5 * v @ G @ v
        ratio = E0 - pE + dld
        accept = metropolis_accept(k_acc, ratio)

        new_pars = jnp.where(accept, pars, state.pars)
        new_lp = jnp.where(accept, lp, state.logtarget)
        new_grad = jnp.where(accept, grad, state.grad)
        new_G = jnp.where(accept, G, state.G)
        new_invG = jnp.where(accept, invG, state.invG)
        new_cholG = jnp.where(accept, cholG, state.cholG)
        new_dphi = jnp.where(accept, dphi, state.dphi)
        new_C = jnp.where(accept, C, state.C)

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
            LMCState(pars=new_pars, logtarget=new_lp, grad=new_grad, G=new_G,
                     invG=new_invG, cholG=new_cholG, dphi=new_dphi, C=new_C,
                     tune=tune, i=state.i + 1),
            info,
        )


@dataclasses.dataclass(frozen=True, repr=False)
class ERMLMC(_LagrangianBase):
    n_leaps: int = 10
    leap_step: float = 0.1
    tuner: Optional[EmpMCTuner] = None

    def __post_init__(self):
        assert self.n_leaps > 0, "Number of leapfrog steps should be > 0"
        assert self.leap_step > 0, "Leapfrog step size should be > 0"

    def _energy_logdet_sign(self):
        return -1.0  # ERMLMC.jl:105: E = -logp - sum(log(diag(cholG))) + ...

    def _velocity_update(self, model, geom, dld, h):
        """Opening semi-implicit velocity solve (ERMLMC.jl:112-125)."""
        G, invG, dphi, C, v = geom
        vxc = _vxC(v, C)
        dld = dld - _slogdet(G + (0.5 * h) * vxc)
        v = jnp.linalg.solve(G + (0.5 * h) * vxc, G @ v - (0.5 * h) * dphi)
        vxc = _vxC(v, C)
        dld = dld + _slogdet(G - (0.5 * h) * vxc)
        return v, dld


@dataclasses.dataclass(frozen=True, repr=False)
class RMLMC(_LagrangianBase):
    n_leaps: int = 6
    leap_step: float = 0.5
    n_newton: int = 4
    tuner: Optional[EmpMCTuner] = None

    def __post_init__(self):
        assert self.n_leaps > 0, "Number of leapfrog steps should be > 0"
        assert self.leap_step > 0, "Leapfrog step size should be > 0"
        assert self.n_newton > 0, "Number of Newton steps should be > 0"

    def _energy_logdet_sign(self):
        return 1.0  # RMLMC.jl:110: E = -logp + sum(log(diag(cholG))) + ...

    def _velocity_update(self, model, geom, dld, h):
        """Opening fixed-point velocity iteration (RMLMC.jl:119-131)."""
        G, invG, dphi, C, v = geom
        lv = v
        vxc = _vxC(lv, C)
        for _ in range(self.n_newton):
            vxc = _vxC(lv, C)
            lv = v - (0.5 * h) * invG @ (vxc @ lv + dphi)
        dld = dld - _slogdet(G + h * vxc)
        return lv, dld
