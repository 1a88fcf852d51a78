"""Sequential / population Monte Carlo runner (reference: src/runners/SeqMC.jl;
Jasra, Stephens & Holmes).

The reference mutates one live coroutine per target, resetting it to each
particle in turn — npart x ntargets x steps coroutine switches
(SeqMC.jl:62-72).  Here particles are the *leading batch axis* and the whole
run is ONE compiled ``lax.scan`` over steps: per step the (static) target
ladder is unrolled, every particle advances under ``vmap`` (SURVEY §3.4 —
"reset" is just writing the batched state's ``pars``), importance weights
update per SeqMC.jl:70, and multinomial resampling happens on device when
``var(exp(logW)) < trigger`` (SeqMC.jl:76-88; an ESS-fraction criterion is
available via ``ess_trigger``).
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
    #: "multinomial" (reference parity, SeqMC.jl:79-86) | "systematic" |
    #: "stratified" — the low-variance comb resamplers (SURVEY §2.4's
    #: prescribed on-device scheme); all are O(N) one-shot device ops
    resampling: str = "multinomial"

    def __post_init__(self):
        assert self.burnin >= 0, f"Burnin rounds ({self.burnin}) should be >= 0"
        assert self.steps > self.burnin, (
            f"Steps ({self.steps}) should be > to burnin ({self.burnin})"
        )
        assert self.resampling in ("multinomial", "systematic", "stratified"), (
            f"unknown resampling {self.resampling!r}"
        )

    def __rmul__(self, other):
        from ..core.task import product

        return product(other, self)


def _target_step(model, sampler, ctx, states, pars, logW, logtarget, key):
    """Advance every particle one step under one target (SeqMC.jl:66-72)."""
    npart = pars.shape[0]
    # "reset" each particle task to its particle value (SeqMC.jl:67)
    states = jax.vmap(lambda s, th: sampler.reset(model, s, th))(states, pars)
    step_keys = jax.random.split(key, npart)
    states, infos = jax.vmap(lambda s, k: sampler.step(model, ctx, s, k))(
        states, step_keys
    )
    new_pars = infos["ppars"]
    plogtarget = infos["plogtarget"]
    ll0 = infos["logtarget"]  # log-target at the reset particle (pre-proposal)
    logW = logW + ll0 - logtarget
    return states, new_pars, logW, plogtarget


def _resample(pars, logW, logtarget, key, trigger, ess_trigger,
              method="multinomial"):
    """Resample when triggered (SeqMC.jl:76-88), on device.

    ``method``: "multinomial" (reference parity), or the low-variance comb
    schemes "systematic" (one uniform offset) / "stratified" (one uniform
    per stratum) via inverse-CDF search over the weight cumsum."""
    W = jnp.exp(logW)
    npart = W.shape[0]
    if ess_trigger is not None:
        wn = W / jnp.sum(W)
        ess = 1.0 / jnp.sum(wn * wn)
        do = ess < ess_trigger * npart
    else:
        do = jnp.var(W, ddof=1) < trigger
    if method == "multinomial":
        idx = jax.random.categorical(key, jnp.log(jnp.maximum(W, 1e-300)),
                                     shape=(npart,))
    else:
        wn = W / jnp.sum(W)
        cum = jnp.cumsum(wn)
        if method == "systematic":
            u = jax.random.uniform(key, (), dtype=wn.dtype)
        else:  # stratified
            u = jax.random.uniform(key, (npart,), dtype=wn.dtype)
        pts = (jnp.arange(npart, dtype=wn.dtype) + u) / npart
        idx = jnp.clip(jnp.searchsorted(cum, pts, side="left"), 0, npart - 1)
    return jax.tree_util.tree_map(
        lambda res, keep: jnp.where(do, res, keep),
        (pars[idx], jnp.zeros_like(logW), logtarget[idx]),
        (pars, logW, logtarget),
    )


@partial(jax.jit, static_argnames=("samplers", "ctxs", "steps", "trigger",
                                   "ess_trigger", "resampling"))
def _seqmc_scan(models, samplers, ctxs, states, pars, logW0, key, *, steps,
                trigger, ess_trigger, resampling="multinomial"):
    npart = pars.shape[0]
    ntargets = len(samplers)

    def one_step(carry, k):
        states, pars, logW, logtarget = carry
        for ti in range(ntargets):  # static target ladder (SeqMC.jl:64)
            k_t = jax.random.fold_in(k, 2 * ti)
            k_res = jax.random.fold_in(k, 2 * ti + 1)
            st, pars, logW, logtarget = _target_step(
                models[ti], samplers[ti], ctxs[ti], states[ti], pars, logW,
                logtarget, k_t,
            )
            states = states[:ti] + (st,) + states[ti + 1:]
            pars, logW, logtarget = _resample(pars, logW, logtarget, k_res,
                                              trigger, ess_trigger,
                                              method=resampling)
        var_w = jnp.var(jnp.exp(logW), ddof=1)
        out = (pars, jnp.exp(logW), var_w)
        # reference-exact: the carried log-target resets to zero after every
        # full ladder pass (SeqMC.jl:91 `logtarget = zeros(npart)`), so each
        # pass's first weight update is ll0 - 0, not a telescoping ratio
        # against the previous pass's final target
        logtarget = jnp.zeros((npart,), dtype=pars.dtype)
        return (states, pars, logW, logtarget), out

    logtarget = jnp.zeros((npart,), dtype=pars.dtype)
    keys = jax.random.split(key, steps)
    (states, pars, logW, logtarget), ys = jax.lax.scan(
        one_step, (states, pars, logW0, logtarget), keys
    )
    return states, ys


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
    pars = pars.astype(targets[-1].model.init.dtype)
    npart = pars.shape[0]

    # per-target batched sampler states (replaces one coroutine per target)
    states = []
    for i, t in enumerate(targets):
        t.sampler.check(t.model)
        kinit = jax.random.fold_in(key, i)
        st = jax.vmap(lambda th, k, _t=t: _t.sampler.init(_t.model, th, k))(
            pars, jax.random.split(kinit, npart)
        )
        states.append(st)

    # exact continuation: reuse particle positions, weights and per-target
    # sampler states (incl. tuner/DA adaptation) from a prior run
    carried = getattr(runner, "_carry", None)
    if targets[-1].state is not None and isinstance(targets[-1].state, dict):
        carried = targets[-1].state
    if carried is not None:
        pars = jnp.asarray(carried["pars"], dtype=pars.dtype)
        if pars.shape[0] != npart:  # re-batch per-target states to match
            npart = pars.shape[0]
            states = []
            for i, t in enumerate(targets):
                kinit = jax.random.fold_in(key, 10_000 + i)
                states.append(jax.vmap(
                    lambda th, k, _t=t: _t.sampler.init(_t.model, th, k)
                )(pars, jax.random.split(kinit, npart)))
    # sized AFTER any carried ensemble replaced the particles
    logW0 = jnp.zeros((npart,), dtype=pars.dtype)
    if carried is not None:
        if "logW" in carried:
            logW0 = jnp.asarray(carried["logW"], dtype=pars.dtype)
        c_states = carried.get("states")
        if c_states is not None and len(c_states) == ntargets:
            lead = jax.tree_util.tree_leaves(c_states)[0].shape[0]
            if lead == npart:
                states = [jax.tree_util.tree_map(jnp.asarray, s)
                          for s in c_states]

    key, k_run = jax.random.split(key)
    states, (all_pars, all_W, all_var) = _seqmc_scan(
        tuple(t.model for t in targets),
        tuple(t.sampler for t in targets),
        tuple(RunCtx(burnin=t.runner.burnin) for t in targets),
        tuple(states), pars, logW0, k_run,
        steps=steps, trigger=runner.trigger, ess_trigger=runner.ess_trigger,
        resampling=runner.resampling,
    )

    all_pars = np.asarray(all_pars)  # (steps, npart, d)
    all_W = np.asarray(all_W)
    if verbose:
        for i, v in enumerate(np.asarray(all_var), start=1):
            print(f"iter {i}, var {float(v)}")

    samples = all_pars[burnin:].reshape(-1, tsize)
    weights = all_W[burnin:].reshape(-1)

    cn = targets[-1].model.column_names()
    nkept = steps - burnin
    # carry the live particle ensemble for exact resume (the reference's
    # resume_seqmc re-runs from scratch, SeqMC.jl:125-128)
    final_carry = {
        "pars": np.asarray(all_pars[-1]),
        "logW": np.log(np.maximum(all_W[-1], 1e-300)),
        "states": tuple(jax.tree_util.tree_map(np.asarray, s) for s in states),
    }
    new_targets = [
        MCMCTask(t.model, t.sampler, t.runner, state=final_carry, key=key,
                 pos=t.pos + steps)
        for t in targets
    ]
    chain = MCMCChain(
        range=range(burnin + 1, nkept * npart + 1),
        samples=Table(samples, cn),
        gradients=Table(np.zeros((0, tsize)), cn),
        diagnostics={
            "weigths": weights,  # [sic] reference key (SeqMC.jl:119)
            "weights": weights,
            "particle": np.tile(np.arange(1, npart + 1), nkept),
        },
        task=new_targets,
        run_time=time.time() - t0,
    )
    return chain


def resume_seqmc(targets, steps: int = 100, **kwargs):
    """Continue a SeqMC run: the final particle ensemble stored in the
    finished tasks becomes the initial particles of the new run."""
    from .api import run

    new = [
        MCMCTask(t.model, t.sampler,
                 dataclasses.replace(t.runner, steps=steps, burnin=0),
                 state=t.state, key=t.key, pos=t.pos)
        for t in targets
    ]
    return run(new, **kwargs)
