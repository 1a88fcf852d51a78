"""Parallel chain engine: vmap within a chip, mesh-sharding across chips.

This replaces the reference's distributed backend — Julia ``pmap`` of whole
chains over worker processes (reference: src/runners/runners.jl:35-42,
examples/parallel_serialmc.jl) — with the idiomatic TPU design (SURVEY §2.4):
identical-structure chains are a *batch axis*, advanced by one vmapped
``lax.scan`` and sharded over a ``jax.sharding.Mesh`` so XLA partitions the
batch across devices (ICI), with no host round-trips.  Chains are
independent, so scaling is embarrassingly parallel; only diagnostics or
pooled adaptation ever touch collectives.

``run_chains`` is the engine (returns stacked arrays, stays on device);
``prun_serialmc`` adapts it to the reference's ``prun`` surface (a list of
per-task chains)."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.chain import MCMCChain
from ..core.task import MCMCTask
from ..samplers.base import RunCtx
from ..utils.table import Table

CHAIN_AXIS = "chains"


def default_mesh(axis=CHAIN_AXIS, devices=None):
    """A 1-D mesh over all local devices (chain data-parallel axis)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def _shard_chains(tree, mesh):
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P(CHAIN_AXIS))

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.devices.size == 0:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, tree)


@partial(jax.jit, static_argnames=("sampler", "ctx", "nsteps", "thinning",
                                   "pool_adaptation"))
def _scan_chains(model, sampler, ctx, states, key, nsteps, thinning=1,
                 pool_adaptation=False):
    """Advance a batch of chains ``nsteps`` steps; ys are the per-step infos.

    With ``thinning > 1`` the scan emits only every ``thinning``-th info
    (steps grouped in an inner ``fori_loop``), keeping output buffers small
    for long thinned runs.  ``pool_adaptation=True`` all-reduces the adapted
    step sizes across chains after every step (see
    :mod:`mcmc_jl_tpu.parallel.collectives`)."""
    from .collectives import pool_tuner_states

    n_chains = jax.tree_util.tree_leaves(states)[0].shape[0]

    # cross-chain adaptation hook: samplers that adapt from pooled batch
    # statistics (e.g. ChEESHMC) expose `pool(ctx, states, info)`; called
    # unconditionally — it IS the sampler's adaptation, not an option
    pool_fn = getattr(sampler, "pool", None)

    def one_step(states, k):
        ks = jax.random.split(k, n_chains)
        states, info = jax.vmap(lambda s, kk: sampler.step(model, ctx, s, kk))(
            states, ks
        )
        if pool_fn is not None:
            states = pool_fn(ctx, states, info)
        if pool_adaptation:
            states = pool_tuner_states(states)
        return states, info

    if thinning == 1:
        keys = jax.random.split(key, nsteps)
        return jax.lax.scan(one_step, states, keys)

    nkept = nsteps // thinning

    def group(states, gks):
        def body(i, st):
            st, _ = one_step(st, gks[i])
            return st

        states = jax.lax.fori_loop(0, thinning - 1, body, states)
        states, info = one_step(states, gks[thinning - 1])
        return states, info

    # same per-step key schedule as the unthinned path: thinning changes
    # which infos are emitted, never the trajectory
    keys = jax.random.split(key, nkept * thinning)
    keys = keys.reshape(nkept, thinning, *keys.shape[1:])
    return jax.lax.scan(group, states, keys)


def init_chains(model, sampler, n_chains, key, inits=None, jitter=0.0,
                mesh=None):
    """Batched sampler state for ``n_chains`` chains.

    ``inits``: (n_chains, size) initial positions; default: model.init
    broadcast (optionally Gaussian-jittered by ``jitter``)."""
    k_init, k_jit = jax.random.split(key)
    if inits is None:
        inits = jnp.broadcast_to(model.init, (n_chains, model.size))
        if jitter > 0:
            inits = inits + jitter * jax.random.normal(
                k_jit, inits.shape, dtype=inits.dtype
            )
    else:
        inits = jnp.asarray(inits)
    inits = _shard_chains(inits, mesh)
    keys = jax.random.split(k_init, n_chains)
    states = jax.vmap(lambda th, k: sampler.init(model, th, k))(inits, keys)
    return _shard_chains(states, mesh)


def run_chains(model, sampler, runner, n_chains, key=None, seed: int = 0,
               inits=None, jitter: float = 0.0, mesh=None, states=None,
               thin_on_device: bool = False, pool_adaptation: bool = False):
    """Run ``n_chains`` identical chains; returns (infos, final_states, key).

    ``infos`` arrays have shape (kept_steps, n_chains, ...) and stay on
    device until the caller materializes them."""
    sampler.check(model)
    if key is None:
        key = jax.random.PRNGKey(seed)
    key, k_init, k_run = jax.random.split(key, 3)
    if states is None:
        states = init_chains(model, sampler, n_chains, k_init, inits=inits,
                             jitter=jitter, mesh=mesh)
    ctx = RunCtx(burnin=runner.burnin)
    thinning = runner.thinning if thin_on_device else 1
    assert runner.len % thinning == 0, (
        f"thin_on_device requires steps ({runner.len}) divisible by "
        f"thinning ({thinning}) — a remainder would silently truncate the "
        f"trajectory"
    )
    final_states, infos = _scan_chains(
        model, sampler, ctx, states, k_run, runner.len, thinning=thinning,
        pool_adaptation=pool_adaptation,
    )
    return infos, final_states, key


def _plain_hmc(task):
    from ..samplers.hmc import HMC

    s = task.sampler
    return (
        type(s) is HMC
        and s.tuner is None
        and not s.store_leaps
        and s._kind is None
        # the kernels implement the whole integrator family; anything else
        # must fall back to the generic engine rather than silently leapfrog
        and s.integrator in ("leapfrog", "2stage", "3stage")
    )


def _plain_mala(task):
    from ..samplers.mala import MALA

    s = task.sampler
    # plain MALA == one-leapfrog HMC at eps = sqrt(driftStep)
    # (ops/glm_hmc.fused_mala_chains; reference MALA.jl:65-126)
    return type(s) is MALA and s.tuner is None


def _fused_eligible(task):
    """Plain fixed-step HMC (or plain MALA, via the one-leapfrog
    equivalence) on a model(glm=...) posterior can route to the fused
    Pallas trajectory kernel (ops/glm_hmc.py)."""
    return getattr(task.model, "glm_spec", None) is not None \
        and (_plain_hmc(task) or _plain_mala(task))


def _target_eligible(task):
    """Plain fixed-step HMC on a non-GLM model can route to the fused
    custom-target kernel (ops/pallas_target.py) IF the model's eval lowers
    through Mosaic — always compile-probed before committing (a model that
    closes over data arrays, or uses unlowerable ops, probes False)."""
    return (
        getattr(task.model, "glm_spec", None) is None
        and (_plain_hmc(task) or _plain_mala(task))
        and task.model.size <= 1024  # VMEM: 6 blocks x blk x d_pad x f32
    )


def prun_serialmc(tasks, seed: int = 0, mesh=None, fused="auto"):
    """Reference-``prun`` surface: a list of SerialMC tasks -> list of chains.

    Tasks with identical (model fns, sampler, runner) are batched into one
    vmapped+sharded launch; heterogeneous lists split into groups.

    ``fused``: "auto" (default) routes plain-HMC groups on ``model(glm=...)``
    posteriors to the fused Pallas kernel when running on TPU; ``True``
    forces the routing (interpret-mode on CPU, for tests); ``False`` always
    uses the generic vmapped engine."""
    t0 = time.time()

    # group tasks by compiled structure
    groups = {}
    for idx, t in enumerate(tasks):
        sig = (t.model.eval, t.model.evalallg, t.sampler, t.runner)
        groups.setdefault(sig, []).append(idx)

    results = [None] * len(tasks)
    key = jax.random.PRNGKey(seed)
    for gi, (sig, idxs) in enumerate(groups.items()):
        t = tasks[idxs[0]]
        n = len(idxs)
        use_fused = (
            fused is not False
            and _fused_eligible(t)
            and (
                fused is True
                or (jax.default_backend() == "tpu"
                    and not jax.config.jax_enable_x64)
            )
        )
        if use_fused and fused == "auto" and jax.default_backend() == "tpu":
            # compile-probe before committing: a custom (ll, resid) link may
            # contain ops Mosaic cannot lower — degrade to the generic
            # engine, never hard-fail a production run (round-1 lesson)
            from ..ops.glm_hmc import model_kernel_supported

            use_fused = model_kernel_supported(t.model, t.sampler, n)
        # non-GLM models: plain HMC can still fuse through the custom-target
        # kernel if the model's eval lowers through Mosaic (probe-guarded)
        use_target = False
        if not use_fused and fused is not False and _target_eligible(t):
            if fused is True:
                # forced (interpret mode on CPU, tests) — still respect the
                # lifted-data budget so over-budget models degrade instead
                # of hard-failing downstream
                from ..ops.pallas_target import lifted_model_block

                use_target = lifted_model_block(t.model) is not None
            elif (fused == "auto" and jax.default_backend() == "tpu"
                  and not jax.config.jax_enable_x64):
                from ..ops.glm_hmc import _pick_block
                from ..ops.pallas_glm import LANE, _round_up
                from ..ops.pallas_target import (lifted_model_block,
                                                 target_kernel_supported)

                lifted = lifted_model_block(t.model)
                use_target = lifted is not None and target_kernel_supported(
                    lifted[0], _round_up(t.model.size, LANE),
                    _pick_block(n),
                    integrator=getattr(t.sampler, "integrator", "leapfrog"),
                    consts=lifted[1])
        # adaptive HMC/HMCDA on a GLM: warmup on the generic engine, frozen
        # hyper-params to the fused kernel for the sampling phase
        # (ops/warmstart.py) — the reference's burnin-gated adaptation
        # semantics (HMC.jl:167-173) at fused-kernel speed
        use_warm = False
        if not use_fused and not use_target and fused is not False:
            from ..ops.warmstart import warm_eligible

            if warm_eligible(t):
                if fused is True:
                    if getattr(t.model, "glm_spec", None) is not None:
                        use_warm = True
                    else:  # forced: still respect the lifted-data budget
                        from ..ops.pallas_target import lifted_model_block

                        use_warm = lifted_model_block(t.model) is not None
                elif (fused == "auto" and jax.default_backend() == "tpu"
                      and not jax.config.jax_enable_x64):
                    from ..samplers.nuts import NUTS as _NUTS

                    if (type(t.sampler) is _NUTS
                            and not t.sampler.warm_handoff):
                        # exact NUTS on a GLM: probe the fused tree-build
                        # kernel (ops/pallas_nuts.py)
                        from ..ops.warmstart import nuts_exact_route_supported

                        use_warm = nuts_exact_route_supported(
                            t.model, t.sampler, n)
                    elif getattr(t.model, "glm_spec", None) is not None:
                        from ..ops.glm_hmc import model_kernel_supported

                        kindm = getattr(t.sampler, "_kind", None)
                        mat = kindm == "dense"
                        # every warm sampling phase runs the dyn-len
                        # kernel now (shared per-step length jitter)
                        use_warm = model_kernel_supported(
                            t.model, t.sampler, n,
                            vec_prior=kindm is not None and not mat,
                            mat_prior=mat, dyn_len=True)
                    else:
                        # adaptive HMC/HMCDA/ChEES/NUTS-handoff on a
                        # bounded custom target: the sampling phase runs
                        # the fused target kernel (vec-eps diag fold /
                        # z-space dense wrapper / dyn-len jittered
                        # lengths) — probe-guarded like every fused route
                        from ..ops.warmstart import target_route_supported

                        use_warm = target_route_supported(
                            t.model, t.sampler, n)
        if (use_fused or use_target or use_warm) and fused == "auto":
            import logging

            logging.getLogger(__name__).info(
                "prun: routing %d %sHMC chains to the fused Pallas "
                "%s kernel (f32); pass fused=False for the generic engine",
                n, "adaptive " if use_warm else "plain-",
                "GLM" if use_fused else
                (("warm-start GLM" if t.model.glm_spec is not None
                  else "warm-start custom-target") if use_warm
                 else "custom-target"),
            )
        if use_warm:
            from ..ops.warmstart import warmfused_chains

            infos, final_states = warmfused_chains(
                t.model, t.sampler, t.runner, n,
                key=jax.random.fold_in(key, gi), mesh=mesh,
            )
        elif use_fused:
            from ..ops.glm_hmc import fused_hmc_chains, fused_mala_chains

            glm_fn = (fused_mala_chains if _plain_mala(t)
                      else fused_hmc_chains)
            infos, final_states = glm_fn(
                t.model, t.sampler, t.runner, n,
                key=jax.random.fold_in(key, gi),
            )
        elif use_target:
            from ..ops.pallas_target import (fused_mala_target_chains,
                                             fused_target_chains)

            tgt_fn = (fused_mala_target_chains if _plain_mala(t)
                      else fused_target_chains)
            infos, final_states = tgt_fn(
                t.model, t.sampler, t.runner, n,
                key=jax.random.fold_in(key, gi),
            )
        else:
            infos, final_states, _ = run_chains(
                t.model, t.sampler, t.runner, n,
                key=jax.random.fold_in(key, gi), mesh=mesh,
            )
        _package_group(t, t.runner, idxs, infos, final_states, key,
                       results, t0)
    return results


def _package_group(t, runner, idxs, infos, final_states, key, results, t0,
                   pos_list=None):
    """Slice kept rows on device, transfer once, build one MCMCChain per
    task index (shared by :func:`prun_serialmc` and
    :func:`presume_serialmc`).  ``pos_list`` (aligned with ``idxs``)
    carries per-task step histories — grouped chains may have been resumed
    different numbers of times."""
    # slice to kept rows and drop pre-step duplicates ON DEVICE before
    # materializing — the host (or tunnel) transfer is the prun
    # bottleneck, not the sampling itself
    keep_idx = jnp.asarray(np.asarray(list(runner.r)) - 1)
    drop = {"pars", "grads", "logtarget"}
    infos = jax.device_get(
        {k: v[keep_idx] for k, v in infos.items() if k not in drop}
    )
    # one bulk transfer of final states; per-chain slicing stays in numpy
    # (per-chain device indexing would cost one tunnel RTT per leaf)
    final_states = jax.device_get(final_states)
    cn = t.model.column_names()
    for ci, idx in enumerate(idxs):
        samples = Table(np.asarray(infos["ppars"])[:, ci], cn)
        if "pgrads" in infos:
            gradients = Table(np.asarray(infos["pgrads"])[:, ci], cn)
        else:
            gradients = Table(np.zeros((0, t.model.size)), cn)
        skip = {"ppars", "pgrads", "plogtarget"}
        diags = {"step": np.asarray(list(runner.r))}
        for k, v in infos.items():
            if k not in skip:
                diags[k] = np.asarray(v)[:, ci]
        diags["logtarget"] = np.asarray(infos["plogtarget"])[:, ci]
        state_i = jax.tree_util.tree_map(lambda a: a[ci], final_states)
        pos0 = t.pos if pos_list is None else pos_list[ci]
        new_task = MCMCTask(t.model, t.sampler, runner, state=state_i,
                            key=jax.random.fold_in(key, 1000 + idx),
                            pos=pos0 + runner.len)
        results[idx] = MCMCChain(
            range=runner.r,
            samples=samples,
            gradients=gradients,
            diagnostics=diags,
            task=new_task,
            run_time=time.time() - t0,
        )


def continuation_route(model, sampler, n, fused="auto", states=None):
    """Shared routing decision for frozen-state continuations
    (:func:`presume_serialmc`, :func:`mcmc_jl_tpu.runners.run_until`):
    True when the batch should continue through the fused kernels
    (``fused`` semantics as in :func:`prun_serialmc`; always
    compile-probed on the auto path, budget-checked on the forced one).
    ``states`` enables the state-dependent eligibility checks (NUTS
    handoff: frozen empirical T carried in NUTSState.tlen)."""
    import types

    from ..ops.warmstart import continue_eligible

    if fused is False:
        return False
    if not continue_eligible(types.SimpleNamespace(model=model,
                                                   sampler=sampler),
                             states=states):
        return False
    if fused is True:
        if model.glm_spec is not None:
            return True
        # forced: still respect the lifted-data budget
        from ..ops.pallas_target import lifted_model_block

        return lifted_model_block(model) is not None
    if not (fused == "auto" and jax.default_backend() == "tpu"
            and not jax.config.jax_enable_x64):
        return False
    from ..samplers.nuts import NUTS as _NUTS

    if (type(sampler) is _NUTS
            and not (sampler.warm_handoff and states is not None
                     and float(np.min(np.asarray(states.tlen))) > 0.0)):
        # exact NUTS continuation: probe the fused tree-build kernel
        from ..ops.warmstart import nuts_exact_route_supported

        return nuts_exact_route_supported(model, sampler, n)
    kindm = getattr(sampler, "_kind", None)
    mat = kindm == "dense"
    # every fused continuation runs a dyn-len driver (shared per-step
    # length jitter) — probe the exact variant
    if model.glm_spec is not None:
        from ..ops.glm_hmc import model_kernel_supported

        return model_kernel_supported(
            model, sampler, n, vec_prior=kindm is not None and not mat,
            mat_prior=mat, dyn_len=True)
    from ..ops.warmstart import target_route_supported

    return target_route_supported(model, sampler, n)


def presume_serialmc(chains, steps: int = 100, seed: int = 0, mesh=None,
                     fused="auto"):
    """Batched resume of a list of SerialMC chains: the reference's
    long-continuation workflow (runners.jl:48-68) at prun scale.

    Identical-structure chains re-batch into one vmapped launch; frozen
    HMC-family states (continuation runners have burnin=0, so adaptation
    never fires again) route to the fused kernels via
    :func:`mcmc_jl_tpu.ops.warmstart.fused_continue_chains` — a resumed
    adapted run continues at fused speed instead of dropping to the
    generic engine.  ``fused`` semantics match :func:`prun_serialmc`.

    PRNG note: each group's continuation stream derives from the FIRST
    member's stored task key only; the other members' stored keys are
    ignored (safe — per-index restamping in ``_package_group`` keeps the
    downstream streams distinct — but per-chain key state is deliberately
    not folded in)."""
    from ..runners.serialmc import SerialMC

    from ..runners.serialmc import resume_serialmc

    t0 = time.time()
    tasks = [c.task if isinstance(c, MCMCChain) else c for c in chains]
    groups = {}
    for idx, t in enumerate(tasks):
        sig = (t.model.eval, t.model.evalallg, t.sampler,
               type(t.runner), t.runner.thinning)
        groups.setdefault(sig, []).append(idx)

    results = [None] * len(chains)
    key = jax.random.PRNGKey(seed)
    for gi, (sig, idxs) in enumerate(groups.items()):
        t = tasks[idxs[0]]
        n = len(idxs)
        if any(tasks[i].state is None for i in idxs):
            # never-run tasks carry no state to batch: plain per-task resume
            for i in idxs:
                results[i] = resume_serialmc(tasks[i], steps=steps)
            continue
        new_runner = SerialMC(steps=steps, thinning=t.runner.thinning)
        states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[tasks[i].state for i in idxs])
        # derive the continuation stream from the STORED task key: every
        # resume segment re-stamps fresh task keys below, so repeated
        # resume() calls advance the PRNG instead of replaying the same
        # refresh/accept sequence (the old per-task path advanced
        # task.key through run_serialmc; the batched path must too)
        base = t.key if t.key is not None else jax.random.fold_in(key, gi)
        k_run = jax.random.fold_in(base, 7)

        use_cont = continuation_route(t.model, t.sampler, n, fused,
                                      states=states)
        if use_cont:
            from ..ops.warmstart import fused_continue_chains

            infos, final_states = fused_continue_chains(
                t.model, t.sampler, states, steps, k_run, mesh=mesh)
        else:
            infos, final_states, _ = run_chains(
                t.model, t.sampler, new_runner, n, key=k_run,
                states=states, mesh=mesh)
        _package_group(t, new_runner, idxs, infos, final_states, k_run,
                       results, t0,
                       pos_list=[tasks[i].pos for i in idxs])
    return results
