"""Sequential / population Monte Carlo runner (reference: src/runners/SeqMC.jl;
Jasra, Stephens & Holmes).

The reference mutates one live coroutine per target, resetting it to each
particle in turn — npart x ntargets x steps coroutine switches
(SeqMC.jl:62-72).  Here particles are the *leading batch axis*: per target,
``vmap`` of the sampler kernel advances all particles in one device launch
(SURVEY §3.4 — "reset" is just writing the batched state's ``pars``), and
multinomial resampling runs on device.  Importance weights follow
SeqMC.jl:70: ``logW[n] += ll0 - logtarget_prev[n]``, with resampling when
``var(exp(logW)) < trigger`` (SeqMC.jl:76-88; the reference's variance
trigger is kept, an ESS-threshold criterion is available via ``ess_trigger``).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.chain import MCMCChain
from ..core.task import MCMCTask
from ..samplers.base import RunCtx
from ..utils.table import Table


@dataclasses.dataclass(frozen=True)
class SeqMC:
    steps: int = 1
    burnin: int = 0
    trigger: float = 1e-10
    ess_trigger: Optional[float] = None  # fraction of npart; alternative criterion

    def __post_init__(self):
        assert self.burnin >= 0, f"Burnin rounds ({self.burnin}) should be >= 0"
        assert self.steps > self.burnin, (
            f"Steps ({self.steps}) should be > to burnin ({self.burnin})"
        )

    def __rmul__(self, other):
        from ..core.task import product

        return product(other, self)


@partial(jax.jit, static_argnames=("sampler", "ctx"))
def _seqmc_target_step(model, sampler, ctx, states, pars, logW, logtarget, key):
    """Advance every particle one step under one target; update weights and
    resample on device if triggered."""
    npart = pars.shape[0]

    # "reset" each particle task to its particle value (SeqMC.jl:67)
    states = jax.vmap(lambda s, th: sampler.reset(model, s, th))(states, pars)

    keys = jax.random.split(key, npart + 1)
    step_keys, k_res = keys[:npart], keys[npart]
    states, infos = jax.vmap(lambda s, k: sampler.step(model, ctx, s, k))(
        states, step_keys
    )

    new_pars = infos["ppars"]
    plogtarget = infos["plogtarget"]
    ll0 = infos["logtarget"]  # log-target at the reset particle (pre-proposal)
    logW = logW + ll0 - logtarget
    logtarget = plogtarget

    return states, new_pars, logW, logtarget, k_res


def _resample(pars, logW, logtarget, key, trigger, ess_trigger):
    """Multinomial resample when triggered (SeqMC.jl:76-88), on device."""
    W = jnp.exp(logW)
    npart = W.shape[0]
    if ess_trigger is not None:
        wn = W / jnp.sum(W)
        ess = 1.0 / jnp.sum(wn * wn)
        do = ess < ess_trigger * npart
    else:
        do = jnp.var(W, ddof=1) < trigger
    idx = jax.random.categorical(key, jnp.log(jnp.maximum(W, 1e-300)), shape=(npart,))
    return jax.tree_util.tree_map(
        lambda res, keep: jnp.where(do, res, keep),
        (pars[idx], jnp.zeros_like(logW), logtarget[idx]),
        (pars, logW, logtarget),
    )


def run_seqmc(targets, particles=None, seed: int = 0, verbose: bool = False):
    ntargets = len(targets)
    tsize = targets[-1].model.size
    runner = targets[-1].runner
    steps, burnin = runner.steps, runner.burnin

    assert all(t.model.size == tsize for t in targets), (
        "Models do not have the same parameter vector size"
    )

    t0 = time.time()
    key = jax.random.PRNGKey(seed)

    if particles is None:
        key, kp = jax.random.split(key)
        particles = jax.random.normal(kp, (100, tsize))
    pars = jnp.asarray(np.asarray(particles, dtype=np.float64))
    if pars.ndim == 1:
        pars = pars[:, None]
    npart = pars.shape[0]

    # per-target batched sampler states (replaces one coroutine per target)
    states = []
    for i, t in enumerate(targets):
        t.sampler.check(t.model)
        kinit = jax.random.fold_in(key, i)
        st = jax.vmap(lambda th, k: t.sampler.init(t.model, th, k))(
            pars, jax.random.split(kinit, npart)
        )
        states.append(st)

    logW = jnp.zeros((npart,))
    logtarget = jnp.zeros((npart,))

    kept_pars = []
    kept_W = []

    ctxs = [RunCtx(burnin=t.runner.burnin) for t in targets]

    for i in range(1, steps + 1):
        for ti, t in enumerate(targets):
            key, k_step = jax.random.split(key)
            states[ti], pars, logW, logtarget, k_res = _seqmc_target_step(
                t.model, t.sampler, ctxs[ti], states[ti], pars, logW, logtarget,
                k_step,
            )
            pars, logW, logtarget = _resample(
                pars, logW, logtarget, k_res, runner.trigger, runner.ess_trigger
            )
        if verbose:
            print(f"iter {i}, var {float(jnp.var(jnp.exp(logW), ddof=1))}")
        logtarget = jnp.zeros((npart,))
        if i > burnin:
            kept_pars.append(np.asarray(pars))
            kept_W.append(np.asarray(jnp.exp(logW)))

    samples = np.concatenate(kept_pars, axis=0)
    weights = np.concatenate(kept_W, axis=0)

    cn = targets[-1].model.column_names()
    nkept = steps - burnin
    chain = MCMCChain(
        range=range(burnin + 1, nkept * npart + 1),
        samples=Table(samples, cn),
        gradients=Table(np.zeros((0, tsize)), cn),
        diagnostics={
            "weigths": weights,  # [sic] reference key (SeqMC.jl:119)
            "weights": weights,
            "particle": np.tile(np.arange(1, npart + 1), nkept),
        },
        task=targets,
        run_time=time.time() - t0,
    )
    return chain


def resume_seqmc(targets, steps: int = 100, **kwargs):
    from .api import run

    new = [
        MCMCTask(t.model, t.sampler,
                 SeqMC(steps=steps, trigger=t.runner.trigger), state=t.state,
                 key=t.key, pos=t.pos)
        for t in targets
    ]
    return run(new, **kwargs)
