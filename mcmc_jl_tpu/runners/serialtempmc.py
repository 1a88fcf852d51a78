"""Serial tempering runner (reference: src/runners/SerialTempMC.jl; Geyer,
"Bayes Factors via Serial Tempering").

An array of tasks forms the temperature ladder; one walker moves through it.
Every ``swap_period`` steps a random other rung is proposed: the walker's
position is written into that rung's sampler state (the functional form of
the reference's live-coroutine ``reset``, SerialTempMC.jl:62), one step is
taken there, and the rung swap is Metropolis-accepted on
``logtarget - logtarget2 + logW2 - logW1`` (SerialTempMC.jl:57-66).  The
reference leaves logW adaptation as a TODO (SerialTempMC.jl:71); we ship a
Wang-Landau-style optional adaptation (``adapt_weights=True``).

The whole run compiles to ONE ``lax.scan`` whose body ``lax.switch``es over
the (static) rung ladder.  Homogeneous ladders keep rung states stacked on a
leading axis; heterogeneous ladders (mixed sampler types) keep them as a
tuple of per-sampler pytrees — either way the walker never touches the host.
``run(..., compiled=False)`` selects the plain host loop for debugging.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.chain import MCMCChain
from ..core.task import MCMCTask
from ..samplers.base import RunCtx
from ..utils.table import Table


@dataclasses.dataclass(frozen=True)
class SerialTempMC:
    steps: int = 1
    burnin: int = 0
    swap_period: int = 5
    adapt_weights: bool = False

    def __post_init__(self):
        assert self.burnin >= 0, f"Burnin rounds ({self.burnin}) should be >= 0"
        assert self.steps > self.burnin, (
            f"Steps ({self.steps}) should be > to burnin ({self.burnin})"
        )

    def __rmul__(self, other):
        from ..core.task import product

        return product(other, self)


@partial(jax.jit, static_argnames=("sampler", "ctx"))
def _one_step(model, sampler, ctx, state, key):
    return sampler.step(model, ctx, state, key)


@partial(jax.jit, static_argnames=("sampler", "ctx"))
def _reset_and_step(model, sampler, ctx, state, pars, key):
    state = sampler.reset(model, state, pars)
    return sampler.step(model, ctx, state, key)


def _stackable(tasks):
    first = type(tasks[0].sampler)
    return all(type(t.sampler) is first for t in tasks)


@partial(jax.jit, static_argnames=("samplers", "ctxs", "steps", "swap_period",
                                   "adapt_weights", "stacked"))
def _temp_scan(models, samplers, ctxs, states, pars0, lp0, key, *, steps,
               swap_period, adapt_weights, stacked=True):
    """One compiled scan over the whole tempered run.

    ``stacked=True``: per-rung sampler states stacked on a leading rung axis
    (homogeneous ladders).  ``stacked=False``: states are a *tuple* of
    per-sampler pytrees (mixed sampler types cannot stack).  Either way the
    switch branches return the (ppars, logtarget) pair every sampler emits,
    so the branch output structure is rung-invariant and the walker never
    touches the host."""
    nmods = len(samplers)

    def step_rung(i, states, pars, key, do_reset):
        """Step rung i (static index); optionally reset its walker position."""
        st = (jax.tree_util.tree_map(lambda a: a[i], states) if stacked
              else states[i])
        st = jax.lax.cond(
            do_reset,
            lambda: samplers[i].reset(models[i], st, pars),
            lambda: st,
        )
        st, info = samplers[i].step(models[i], ctxs[i], st, key)
        if stacked:
            states = jax.tree_util.tree_map(
                lambda a, b: a.at[i].set(b), states, st
            )
        else:
            states = states[:i] + (st,) + states[i + 1:]
        # returns (post-step position, post-step lp, pre-step lp).  After a
        # reset the pre-step lp is exactly lp_rung(walker position) — the
        # quantity the swap ratio needs.  NOTE deliberate deviation from the
        # reference, which carries the stale pre-step lp as the walker's own
        # density (SerialTempMC.jl:52,72): we carry plogtarget, so the swap
        # ratio compares both rungs at the position the walker actually
        # holds.
        return states, (info["ppars"], info["plogtarget"], info["logtarget"])

    def one_step(carry, inp):
        states, at, pars, logtarget, logW = carry
        i, key = inp
        k_step, k_pick, k_acc = jax.random.split(key, 3)

        do_swap = (i % swap_period) == 0
        # pick another rung uniformly (SerialTempMC.jl:58-60)
        at2 = jax.random.randint(k_pick, (), 0, nmods - 1, dtype=jnp.int32)
        at2 = jnp.where(at2 >= at, at2 + 1, at2).astype(jnp.int32)
        target = jnp.where(do_swap, at2, at)

        branches = [
            lambda sts, p, k, rst, _i=_i: step_rung(_i, sts, p, k, rst)
            for _i in range(nmods)
        ]
        states, (ppars, lp_post, lp_pre) = jax.lax.switch(
            target, branches, states, pars, k_step, do_swap
        )

        # Metropolis swap on tempered weights (SerialTempMC.jl:62-66):
        # lp_pre = lp_rung2(x) after the reset, so both terms are densities
        # of the same walker position x under the two rungs
        ratio = logtarget - lp_pre + logW[at2] - logW[at]
        u = jnp.log(jax.random.uniform(k_acc, ()))
        take = jnp.where(do_swap,
                         jnp.where(jnp.isnan(ratio), False, u < ratio),
                         True)
        new_at = jnp.where(do_swap & take, at2, at)
        new_pars = jnp.where(take, ppars, pars)
        new_lp = jnp.where(take, lp_post, logtarget)

        if adapt_weights:
            logW = logW.at[new_at].add(-1.0 / i)

        return (states, new_at, new_pars, new_lp, logW), (new_pars, new_at)

    idx = jnp.arange(1, steps + 1)
    keys = jax.random.split(key, steps)
    carry0 = (states, jnp.asarray(0, jnp.int32), pars0, lp0,
              jnp.zeros((nmods,), dtype=pars0.dtype))
    (states, at, pars, lp, logW), (all_pars, all_at) = jax.lax.scan(
        one_step, carry0, (idx, keys)
    )
    return states, logW, all_pars, all_at


def run_serialtempmc(tasks, seed: int = 0, compiled: bool = True):
    nmods = len(tasks)
    tsize = tasks[-1].model.size
    runner = tasks[-1].runner
    steps, burnin, swap_period = runner.steps, runner.burnin, runner.swap_period

    assert all(t.model.size == tsize for t in tasks), (
        "Models do not have the same parameter vector size"
    )
    for t in tasks:
        t.sampler.check(t.model)

    t0 = time.time()
    key = jax.random.PRNGKey(seed)

    if not compiled:
        return _run_host(tasks, key, seed, t0)
    return _run_on_device(tasks, key, t0, stacked=_stackable(tasks))


def _run_on_device(tasks, key, t0, stacked=True):
    nmods = len(tasks)
    tsize = tasks[-1].model.size
    runner = tasks[-1].runner
    steps, burnin = runner.steps, runner.burnin

    states = [
        t.sampler.init(t.model, t.model.init, jax.random.fold_in(key, i))
        for i, t in enumerate(tasks)
    ]

    # initialize from rung 0 (SerialTempMC.jl:52-55)
    key, k0, k_run = jax.random.split(key, 3)
    st0, info0 = _one_step(tasks[0].model, tasks[0].sampler,
                           RunCtx(burnin=burnin), states[0], k0)
    pars0, lp0 = info0["ppars"], info0["plogtarget"]

    state_arg = (jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
                 if stacked else tuple(states))
    final_states, logW, all_pars, all_at = _temp_scan(
        tuple(t.model for t in tasks),
        tuple(t.sampler for t in tasks),
        tuple(RunCtx(burnin=t.runner.burnin) for t in tasks),
        state_arg, pars0, lp0, k_run,
        steps=steps, swap_period=runner.swap_period,
        adapt_weights=runner.adapt_weights, stacked=stacked,
    )
    samples = np.asarray(all_pars)[burnin:]
    rungs = np.asarray(all_at)[burnin:] + 1
    return _make_chain(tasks, samples, rungs, np.asarray(logW), t0)


def _run_host(tasks, key, seed, t0):
    """Fallback for ladders mixing sampler types."""
    nmods = len(tasks)
    tsize = tasks[-1].model.size
    runner = tasks[-1].runner
    steps, burnin, swap_period = runner.steps, runner.burnin, runner.swap_period
    rng = np.random.default_rng(seed)

    states, ctxs = [], []
    for i, t in enumerate(tasks):
        states.append(t.sampler.init(t.model, t.model.init,
                                     jax.random.fold_in(key, i)))
        ctxs.append(RunCtx(burnin=t.runner.burnin))

    logW = np.zeros(nmods)
    at = 0
    key, k0 = jax.random.split(key)
    states[at], info = _one_step(tasks[at].model, tasks[at].sampler, ctxs[at],
                                 states[at], k0)
    pars, logtarget = info["ppars"], info["plogtarget"]

    samples = np.empty((steps - burnin, tsize))
    rungs = np.empty(steps - burnin, dtype=np.int64)

    for i in range(1, steps + 1):
        key, k_step = jax.random.split(key)
        if i % swap_period == 0:
            at2 = int(rng.integers(0, nmods - 1))
            at2 = at2 + 1 if at2 >= at else at2
            states[at2], s2 = _reset_and_step(
                tasks[at2].model, tasks[at2].sampler, ctxs[at2], states[at2],
                pars, k_step,
            )
            ratio = float(logtarget) - float(s2["logtarget"]) + logW[at2] - logW[at]
            if rng.random() < np.exp(min(ratio, 0.0) if np.isfinite(ratio) else -np.inf):
                at, info = at2, s2
        else:
            states[at], info = _one_step(
                tasks[at].model, tasks[at].sampler, ctxs[at], states[at], k_step
            )
        if runner.adapt_weights:
            logW[at] -= 1.0 / i
        pars = info["ppars"]
        logtarget = info["plogtarget"]
        if i > burnin:
            samples[i - burnin - 1] = np.asarray(pars)
            rungs[i - burnin - 1] = at + 1

    return _make_chain(tasks, samples, rungs, logW, t0)


def _make_chain(tasks, samples, rungs, logW, t0):
    tsize = tasks[-1].model.size
    runner = tasks[-1].runner
    cn = tasks[-1].model.column_names()
    return MCMCChain(
        range=range(runner.burnin + 1, runner.steps + 1),
        samples=Table(samples, cn),
        gradients=Table(np.zeros((0, tsize)), cn),
        diagnostics={"mod": rungs, "logW": logW},
        task=tasks,
        run_time=time.time() - t0,
    )


def resume_serialtempmc(tasks, steps: int = 100, **kwargs):
    from .api import run

    new = [
        MCMCTask(t.model, t.sampler,
                 dataclasses.replace(t.runner, steps=steps, burnin=0),
                 state=t.state, key=t.key, pos=t.pos)
        for t in tasks
    ]
    return run(new, **kwargs)
