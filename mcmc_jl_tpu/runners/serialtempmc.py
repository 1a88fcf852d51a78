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


def run_serialtempmc(tasks, seed: int = 0):
    nmods = len(tasks)
    tsize = tasks[-1].model.size
    runner = tasks[-1].runner
    steps, burnin, swap_period = runner.steps, runner.burnin, runner.swap_period

    assert all(t.model.size == tsize for t in tasks), (
        "Models do not have the same parameter vector size"
    )

    t0 = time.time()
    key = jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)

    states = []
    ctxs = []
    for i, t in enumerate(tasks):
        t.sampler.check(t.model)
        states.append(t.sampler.init(t.model, t.model.init, jax.random.fold_in(key, i)))
        ctxs.append(RunCtx(burnin=t.runner.burnin))

    logW = np.zeros(nmods)  # task weights (adaptation optional)
    at = 0  # current rung
    key, k0 = jax.random.split(key)
    states[at], info = _one_step(tasks[at].model, tasks[at].sampler, ctxs[at],
                                 states[at], k0)
    pars = info["ppars"]
    logtarget = info["logtarget"]

    samples = np.empty((steps - burnin, tsize))
    rungs = np.empty(steps - burnin, dtype=np.int64)

    for i in range(1, steps + 1):
        key, k_step = jax.random.split(key)
        if i % swap_period == 0:
            # propose a random other rung (SerialTempMC.jl:58-60)
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
            # Wang-Landau-flavored occupation balancing (reference TODO)
            logW[at] -= 1.0 / i

        pars = info["ppars"]
        logtarget = info["logtarget"]

        if i > burnin:
            samples[i - burnin - 1] = np.asarray(pars)
            rungs[i - burnin - 1] = at + 1

    cn = tasks[-1].model.column_names()
    chain = MCMCChain(
        range=range(burnin + 1, steps + 1),
        samples=Table(samples, cn),
        gradients=Table(np.zeros((0, tsize)), cn),
        diagnostics={"mod": rungs, "logW": logW},
        task=tasks,
        run_time=time.time() - t0,
    )
    return chain


def resume_serialtempmc(tasks, steps: int = 100, **kwargs):
    from .api import run

    new = [
        MCMCTask(t.model, t.sampler,
                 SerialTempMC(steps=steps, swap_period=t.runner.swap_period),
                 state=t.state, key=t.key, pos=t.pos)
        for t in tasks
    ]
    return run(new, **kwargs)
