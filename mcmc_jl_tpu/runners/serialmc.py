"""SerialMC runner: the single-chain control loop as one ``lax.scan``.

The reference's runner is a host loop that ``consume``s a coroutine once per
step and stores rows whose index falls in the kept range
(reference: src/runners/SerialMC.jl:37-85).  Here the whole run is a single
compiled ``lax.scan`` over per-step PRNG keys — the coroutine boundary
disappears (SURVEY §3.1) and the same scan body is what the parallel engine
vmaps over thousands of chains.
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
class SerialMC:
    """Keep range semantics identical to the reference (SerialMC.jl:12-35):
    ``SerialMC(steps=, burnin=, thinning=)`` or ``SerialMC(range(a, b, s))``
    keeps 1-based steps ``burnin+1 : thinning : steps``."""

    burnin: int
    thinning: int
    len: int
    r: range

    def __init__(self, steps=None, burnin=0, thinning=1):
        if isinstance(steps, range):
            r = steps
            assert r.step >= 1, "Thinning should be >= 1"
            burnin, thinning = r.start - 1, r.step
            last = r.start + (max(len(r) - 1, 0)) * r.step
            object.__setattr__(self, "burnin", burnin)
            object.__setattr__(self, "thinning", thinning)
            object.__setattr__(self, "len", last)
            object.__setattr__(self, "r", r)
        else:
            steps = 100 if steps is None else steps
            object.__setattr__(self, "burnin", burnin)
            object.__setattr__(self, "thinning", thinning)
            object.__setattr__(self, "len", steps)
            object.__setattr__(self, "r", range(burnin + 1, steps + 1, thinning))
        assert self.burnin >= 0, f"Burnin rounds ({self.burnin}) should be >= 0"
        assert self.len > self.burnin, (
            f"Total MCMC length ({self.len}) should be > to burnin ({self.burnin})"
        )
        assert self.thinning >= 1, f"Thinning ({self.thinning}) should be >= 1"

    def __rmul__(self, other):
        from ..core.task import product

        return product(other, self)


@partial(jax.jit, static_argnames=("sampler", "ctx", "nsteps"))
def _scan_steps(model, sampler, ctx, state, key, nsteps):
    keys = jax.random.split(key, nsteps)

    def body(st, k):
        return sampler.step(model, ctx, st, k)

    return jax.lax.scan(body, state, keys)


def run_serialmc(task: MCMCTask, key=None, seed: int = 0) -> MCMCChain:
    model, sampler, runner = task.model, task.sampler, task.runner
    sampler.check(model)

    t0 = time.time()
    if key is None:
        key = jax.random.PRNGKey(seed)
    key, k_init, k_run = jax.random.split(key, 3)

    if task.state is None:
        state = sampler.init(model, model.init, k_init)
        lp0 = state.logtarget if hasattr(state, "logtarget") else model.eval(model.init)
        if not bool(jnp.isfinite(jnp.asarray(lp0))):
            raise ValueError("Initial values out of model support, try other values")
    else:
        state = task.state  # exact continuation

    ctx = RunCtx(burnin=runner.burnin)
    final_state, infos = _scan_steps(model, sampler, ctx, state, k_run, runner.len)
    infos = jax.device_get(infos)

    chain = _chain_from_infos(infos, runner.r, model, task, final_state, key,
                              run_time=None)
    chain.run_time = time.time() - t0
    return chain


def _chain_from_infos(infos, r, model, task, final_state, key, run_time=None):
    keep = np.asarray(list(r)) - 1  # 1-based kept steps -> 0-based ys rows
    cn = model.column_names()

    samples = Table(np.asarray(infos["ppars"])[keep], cn)
    if "pgrads" in infos:
        gradients = Table(np.asarray(infos["pgrads"])[keep], cn)
    else:
        gradients = Table(np.zeros((0, model.size)), cn)

    skip = {"ppars", "pgrads", "pars", "grads", "plogtarget", "logtarget"}
    diags = {"step": np.asarray(list(r))}
    for k, v in infos.items():
        if k not in skip:
            diags[k] = np.asarray(v)[keep]
    diags["logtarget"] = np.asarray(infos["plogtarget"])[keep]

    new_task = MCMCTask(
        model=task.model,
        sampler=task.sampler,
        runner=task.runner,
        state=final_state,
        key=key,
        pos=task.pos + task.runner.len,
    )
    chain = MCMCChain(
        range=r,
        samples=samples,
        gradients=gradients,
        diagnostics=diags,
        task=new_task,
        run_time=np.nan if run_time is None else run_time,
    )
    return chain


def resume_serialmc(task: MCMCTask, steps: int = 100) -> MCMCChain:
    """Exact resume: continue from the stored state/key.

    The reference's ``resume_serialmc`` restarts model*sampler with a fresh
    SerialMC and loses adaptive state (SerialMC.jl:93-97); here the sampler
    state pytree (including tuner state) carries over bit-exactly.
    """
    assert isinstance(task.runner, SerialMC), (
        f"resume_serialmc cannot be called on a task whose runner is "
        f"{type(task.runner).__name__}"
    )
    new_runner = SerialMC(steps=steps, thinning=task.runner.thinning)
    t = MCMCTask(task.model, task.sampler, new_runner, state=task.state,
                 key=task.key, pos=task.pos)
    return run_serialmc(t, key=task.key)
