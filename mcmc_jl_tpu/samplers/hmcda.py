"""Adaptive HMC with Nesterov dual averaging (reference: src/samplers/HMCDA.jl;
Hoffman & Gelman 2011, Algorithm 5).

- initial step size by the doubling/halving heuristic (HMCDA.jl:51-69),
  bounded to 100 iterations for device safety
- ``n_leaps = max(1, round(len / eps))`` each iteration (HMCDA.jl:104)
- dual-averaging update during burn-in, frozen ``exp(log eps-bar)`` after
  (HMCDA.jl:133-141); defaults rate=0.65, len=2, shrinkage=0.05, t0=10,
  step=0.75 (HMCDA.jl:42-43)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .base import RunCtx, Sampler, pytree_dataclass
from .integrators import get_integrator, hamiltonian, leapfrog
from .massadapt import (
    MassAccum, dense_transforms, mass_init, mass_kind, mass_update,
    mass_vector_scale,
)


@pytree_dataclass
class HMCDAState:
    pars: jnp.ndarray
    logtarget: jnp.ndarray
    grad: jnp.ndarray
    leap_step: jnp.ndarray
    dual_leap_step: jnp.ndarray
    dual_h: jnp.ndarray
    mu: jnp.ndarray
    i: jnp.ndarray
    # Mass-matrix warmup accumulators (massadapt.py) — the same options as
    # HMC/NUTS (mass_adapt=False|True/"diag"|"diag-win"|"dense"); the
    # dual-averaged step size and the metric adapt side by side during
    # burn-in and both freeze after (VERDICT r4 next #8)
    mass: MassAccum


def find_reasonable_step(model, pars, lp, grad, m, key, max_iter=100):
    """Doubling/halving heuristic for the initial step size (HMCDA.jl:51-69).

    Uses the acceptance-probability direction ``exp(H0 - H1)`` (as the same
    heuristic does in NUTS.jl:72-82 and in the paper's Algorithm 4)."""
    H0 = hamiltonian(lp, m)

    def accept_prob(eps):
        _, lp1, _, m1 = leapfrog(model, pars, m, grad, eps)
        p = jnp.exp(H0 - hamiltonian(lp1, m1))
        return jnp.where(jnp.isnan(p), 0.0, p)

    eps0 = jnp.asarray(1.0, dtype=pars.dtype)
    p0 = accept_prob(eps0)
    a = jnp.where(p0 > 0.5, 1.0, -1.0)

    def cond(carry):
        eps, p, it = carry
        return (p**a > 2.0 ** (-a)) & (it < max_iter)

    def body(carry):
        eps, p, it = carry
        eps = eps * 2.0**a
        return eps, accept_prob(eps), it + 1

    eps, _, _ = jax.lax.while_loop(cond, body, (eps0, p0, jnp.asarray(0)))
    return eps


@dataclasses.dataclass(frozen=True, repr=False)
class HMCDA(Sampler):
    rate: float = 0.65
    len: float = 2.0
    shrinkage: float = 0.05
    t0: float = 10.0
    step_pow: float = 0.75  # the reference's `step` kwarg (t^-step schedule)
    store_leaps: bool = False  # accepted for API parity; trajectories not stored
    #: "leapfrog" | "2stage" | "3stage" (samplers/integrators.py); trajectory
    #: length `len` still counts macro steps of size eps
    integrator: str = "leapfrog"
    #: False | True/"diag" (continuous Welford) | "diag-win" | "dense" —
    #: the same mass-matrix warmup as HMC (massadapt.py)
    mass_adapt: object = False

    needs_gradient = True

    def __init__(self, rate=0.65, len=2.0, shrinkage=0.05, t0=10.0, step=0.75,
                 store_leaps=False, step_pow=None, integrator="leapfrog",
                 mass_adapt=False):
        object.__setattr__(self, "rate", float(rate))
        object.__setattr__(self, "len", float(len))
        object.__setattr__(self, "shrinkage", float(shrinkage))
        object.__setattr__(self, "t0", float(t0))
        object.__setattr__(self, "step_pow", float(step if step_pow is None else step_pow))
        object.__setattr__(self, "store_leaps", bool(store_leaps))
        get_integrator(integrator)  # validate early
        object.__setattr__(self, "integrator", integrator)
        mass_kind(mass_adapt)  # validate early
        object.__setattr__(self, "mass_adapt", mass_adapt)
        self.__post_init__()

    @property
    def _kind(self):
        return mass_kind(self.mass_adapt)

    def __post_init__(self):
        assert 0.0 < self.rate < 1.0, "Target acceptance rate should be in (0, 1)"
        assert self.len > 0, "len parameter of HMCDA sampler must be positive"
        assert self.shrinkage > 0, "shrinkage parameter must be positive"
        assert self.t0 >= 0, "t0 parameter must be non-negative"

    def init(self, model, theta0, key):
        lp, g = model.evalallg(theta0)
        m = jax.random.normal(key, theta0.shape, dtype=theta0.dtype)
        eps = find_reasonable_step(model, theta0, lp, g, m, key)
        return HMCDAState(
            pars=theta0, logtarget=lp, grad=g,
            leap_step=eps,
            dual_leap_step=jnp.asarray(1.0, dtype=theta0.dtype),
            dual_h=jnp.asarray(0.0, dtype=theta0.dtype),
            mu=jnp.log(10.0 * eps),
            i=jnp.asarray(1, dtype=jnp.int32),
            mass=mass_init(self._kind, theta0.shape[0], theta0.dtype),
        )

    def reset(self, model, state, theta):
        lp, g = model.evalallg(theta)
        return state.replace(pars=theta, logtarget=lp, grad=g)

    def step(self, model, ctx: RunCtx, state, key):
        k_mom, k_acc = jax.random.split(key)
        dtype = state.pars.dtype
        eps = state.leap_step

        kind = self._kind
        if kind == "dense":
            # standardized coordinates theta = L z (the HMC dense path,
            # samplers/hmc.py step): unit-metric dynamics in z == dense
            # inverse-mass Sigma-hat = L L' in theta
            import types

            L = state.mass.scale.astype(dtype)
            fwd, inv, gfwd, ginv = dense_transforms(L)
            work_model = types.SimpleNamespace(
                evalallg=lambda z: (lambda lp_g: (lp_g[0], gfwd(lp_g[1])))(
                    model.evalallg(fwd(z))
                )
            )
            pars0, grad0 = inv(state.pars), gfwd(state.grad)
            eps_step = eps
        else:
            # diag kinds: vector integrator step eps * scale; the length
            # rule below keeps counting scalar-eps time (like ChEES)
            eps_step = (eps * mass_vector_scale(kind, state.mass, dtype)
                        if kind is not None else eps)
            work_model = model
            pars0, grad0 = state.pars, state.grad

        m0 = jax.random.normal(k_mom, state.pars.shape, dtype=dtype)
        H0 = hamiltonian(state.logtarget, m0)

        n_leaps = jnp.maximum(1, jnp.round(self.len / eps)).astype(jnp.int32)
        step_fn, _ = get_integrator(self.integrator)

        def body(j, carry):
            pars, lp, g, m = carry
            return step_fn(work_model, pars, m, g, eps_step)

        pars, lp, g, m = jax.lax.fori_loop(
            0, n_leaps, body, (pars0, state.logtarget, grad0, m0)
        )
        if kind == "dense":  # back to theta-space
            pars, g = fwd(pars), ginv(g)

        H = hamiltonian(lp, m)
        p = jnp.minimum(1.0, jnp.exp(H0 - H))
        p = jnp.where(jnp.isnan(p), 0.0, p)
        accept = jax.random.uniform(k_acc, (), dtype=dtype) < p

        new_pars = jnp.where(accept, pars, state.pars)
        new_lp = jnp.where(accept, lp, state.logtarget)
        new_grad = jnp.where(accept, g, state.grad)

        # --- dual averaging (HMCDA.jl:133-141) ---------------------------
        i = state.i.astype(dtype)
        in_burnin = state.i < ctx.burnin
        eta = 1.0 / (i + self.t0)
        dual_h = (1.0 - eta) * state.dual_h + eta * (self.rate - p)
        eps_adapt = jnp.exp(state.mu - jnp.sqrt(i) * dual_h / self.shrinkage)
        eta2 = i ** (-self.step_pow)
        dual_eps = jnp.exp(
            (1.0 - eta2) * jnp.log(state.dual_leap_step) + eta2 * jnp.log(eps_adapt)
        )
        new_eps = jnp.where(in_burnin, eps_adapt, state.dual_leap_step)
        new_dual_eps = jnp.where(in_burnin, dual_eps, state.dual_leap_step)
        new_dual_h = jnp.where(in_burnin, dual_h, state.dual_h)

        info = {
            "ppars": new_pars,
            "plogtarget": new_lp,
            "pgrads": new_grad,
            "pars": state.pars,
            "logtarget": state.logtarget,
            "grads": state.grad,
            "accept": accept,
        }
        mass = mass_update(kind, state.mass, new_pars, state.i, ctx.burnin)

        return (
            HMCDAState(
                pars=new_pars, logtarget=new_lp, grad=new_grad,
                leap_step=new_eps, dual_leap_step=new_dual_eps,
                dual_h=new_dual_h, mu=state.mu, i=state.i + 1, mass=mass,
            ),
            info,
        )
