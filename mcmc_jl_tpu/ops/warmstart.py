"""Warm-start pipeline: adaptive warmup, frozen hyper-params, fused sampling.

The reference's adaptive samplers stop adapting at the end of burn-in anyway
(EmpMCTuner is burnin-gated, reference src/samplers/HMC.jl:167-173; dual
averaging freezes ``exp(log eps-bar)`` after burn-in, HMCDA.jl:133-141), so
an adaptive run is structurally *two phases*: a short adaptation phase and a
long fixed-hyper-parameter sampling phase.  On TPU the sampling phase is
exactly what the fused Pallas GLM kernels (:mod:`.pallas_glm`) execute at
speed-of-light — this module wires the phases together:

1. **Warmup** (``runner.burnin`` steps): the generic vmapped engine runs the
   sampler as-is — per-chain EmpMCTuner / dual-averaging / diagonal-mass
   Welford adaptation, identical to a non-fused run.
2. **Freeze**: the per-chain adapted step sizes are pooled (median across
   chains — all chains target the same posterior, and a shared step size is
   what the single-kernel launch wants), trajectory lengths likewise; a
   diagonal mass metric is pooled as the across-chain RMS of the per-chain
   scales.
3. **Fused sampling** (``len - burnin`` steps): the frozen ``(eps, n_leaps)``
   drive the fused trajectory kernel.  A diagonal metric folds in exactly:
   with ``theta = S z`` (S = diag of the pooled scale) the GLM posterior in
   ``z`` is again a GLM — design ``X S``, per-coordinate prior precision
   ``lam * s_j^2`` (the kernels' vector-prior path) — and unit-mass HMC in
   ``z`` IS diagonal-mass HMC in ``theta``.  Samples/gradients map back as
   ``theta = s * z``, ``g_theta = g_z / s``; the log-target is invariant.

The only statistical deviation from running the generic engine end-to-end is
the cross-chain pooling of the frozen hyper-parameters — sampling-phase
chains are still exact MCMC for the model posterior (fixed-kernel Metropolis,
reference accept rule), so posterior expectations are unbiased regardless of
the pooled values.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def warm_eligible(task):
    """True when (model, sampler, runner) can take the warmup->freeze->fused
    pipeline: an adaptive HMC (EmpMCTuner and/or diagonal mass adaptation)
    or HMCDA on a ``model(glm=...)`` posterior with a burn-in window.
    Plain fixed-hyper HMC routes through ``_fused_eligible`` instead."""
    return _warm_ok(task.model, task.sampler, task.runner)


def _warm_ok(model, sampler, runner):
    from ..samplers.hmc import HMC
    from ..samplers.hmcda import HMCDA

    if getattr(model, "glm_spec", None) is None:
        return False
    if runner.burnin < 1 or runner.len <= runner.burnin:
        return False
    s = sampler
    if isinstance(s, HMC):
        if s.store_leaps or s.integrator not in ("leapfrog", "2stage",
                                                 "3stage"):
            return False
        if s._kind not in (None, "diag", "diag-win"):
            return False  # dense metric: no kernel fold (falls back)
        return s.tuner is not None or s._kind is not None
    if isinstance(s, HMCDA):
        return (not s.store_leaps
                and s.integrator in ("leapfrog", "2stage", "3stage"))
    return False


def _freeze(sampler, states_w):
    """Pool per-chain adapted hyper-parameters into kernel constants.

    Returns ``(eps, n_leaps, s)``; ``s`` is the pooled per-coordinate
    inverse-mass sqrt (None = unit metric)."""
    from ..samplers.hmc import HMC
    from ..samplers.massadapt import mass_vector_scale

    if isinstance(sampler, HMC):
        if sampler.tuner is not None:
            eps = float(np.median(np.asarray(states_w.tune.step_size)))
            nl = int(np.median(np.asarray(states_w.tune.n_leaps)))
        else:
            eps, nl = sampler.leap_step, sampler.n_leaps
        kind = sampler._kind
        if kind is not None:
            dtype = states_w.pars.dtype
            s_c = jax.vmap(
                lambda acc: mass_vector_scale(kind, acc, dtype)
            )(states_w.mass)
            s = np.sqrt(np.mean(np.asarray(s_c, np.float64) ** 2, axis=0))
            if np.allclose(s, 1.0):
                s = None  # adaptation never armed: skip the reparam
        else:
            s = None
        return eps, max(int(nl), 1), s
    # HMCDA: the frozen dual-averaged step (HMCDA.jl:133-141), trajectory
    # length from the target path length (HMCDA.jl:104)
    eps = float(np.median(np.asarray(states_w.dual_leap_step)))
    nl = max(1, int(round(sampler.len / eps)))
    return eps, nl, None


def warmfused_hmc_chains(model, sampler, runner, n_chains, key,
                         interpret=None):
    """Adaptive warmup on the generic engine + fused-kernel sampling phase.

    Returns ``(infos, final_states)`` protocol-compatible with
    :func:`mcmc_jl_tpu.parallel.run_chains`: infos cover ALL ``runner.len``
    steps (warmup rows from the generic engine, sampling rows from the
    kernel) with the post-accept keys ``ppars/pgrads/plogtarget/accept``;
    final states carry the adaptation pytrees (frozen at the pooled values)
    so ``resume`` continues bit-coherently at the same hyper-parameters.
    """
    from ..parallel.pchains import _scan_chains, init_chains
    from ..samplers.base import RunCtx, TuneState
    from ..samplers.hmc import HMC
    from .glm_hmc import _pick_block, _run
    from .pallas_glm import pad_chains, pad_design

    spec = model.glm_spec
    assert _warm_ok(model, sampler, runner), \
        "warmfused_hmc_chains requires an adaptive HMC/HMCDA GLM task"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    key, k_init, k_warm, k_samp = jax.random.split(key, 4)

    # ---- phase 1: adaptive warmup on the generic vmapped engine ----------
    states0 = init_chains(model, sampler, n_chains, k_init)
    ctx = RunCtx(burnin=runner.burnin)
    states_w, infos_w = _scan_chains(model, sampler, ctx, states0, k_warm,
                                     runner.burnin)

    # ---- phase 2: freeze + metric fold -----------------------------------
    eps, nl, s = _freeze(sampler, states_w)
    X = np.asarray(spec.X, np.float64)
    d = model.size
    lam = float(spec.prior_prec)
    theta_w = np.asarray(states_w.pars, np.float64)  # (C, d)
    if s is not None:
        Xs = X * s[None, :]
        theta0 = theta_w / s[None, :]
    else:
        Xs, theta0 = X, theta_w
    XT, Y2, d_pad = pad_design(Xs, spec.Y)
    N = XT.shape[1]
    if s is not None:
        lam_vec = jnp.asarray(
            np.concatenate([lam * s * s, np.ones(d_pad - d)]),
            jnp.float32).reshape(1, d_pad)
    else:
        lam_vec = None
    W = (None if spec.weights is None
         else jnp.reshape(jnp.asarray(spec.weights, jnp.float32), (1, N)))
    O = (None if spec.offsets is None
         else jnp.reshape(jnp.asarray(spec.offsets, jnp.float32), (1, N)))

    # ---- phase 3: fused sampling -----------------------------------------
    steps2 = runner.len - runner.burnin
    block = _pick_block(n_chains)
    (thetaF, lpF, gF), infos2 = _run(
        XT, Y2, pad_chains(jnp.asarray(theta0, jnp.float32), d_pad),
        jnp.float32(eps), k_samp, d=d, steps=steps2, n_leaps=nl,
        block_chains=block, interpret=interpret, kind=spec.kind,
        W=W, O=O, lam=lam, lam_vec=lam_vec, collect=True,
        integrator=sampler.integrator, fused_step=False,
    )

    # ---- un-fold the metric & assemble the full-run infos ----------------
    if s is not None:
        sj = jnp.asarray(s, jnp.float32)
        ppars2 = infos2["ppars"][..., :d] * sj
        pgrads2 = infos2["pgrads"][..., :d] / sj
        theta_model = thetaF[:, :d] * sj
    else:
        ppars2 = infos2["ppars"][..., :d]
        pgrads2 = infos2["pgrads"][..., :d]
        theta_model = thetaF[:, :d]
    cat = lambda a, b: jnp.concatenate(  # noqa: E731
        [jnp.asarray(a), jnp.asarray(b, jnp.asarray(a).dtype)], axis=0)
    infos = {
        "ppars": cat(infos_w["ppars"], ppars2),
        "pgrads": cat(infos_w["pgrads"], pgrads2),
        "plogtarget": cat(infos_w["plogtarget"], infos2["plogtarget"]),
        "accept": cat(infos_w["accept"], infos2["accept"]),
    }

    # ---- final states: warmup pytrees + fused position, frozen tune ------
    theta_model = theta_model.astype(states_w.pars.dtype)
    states = jax.vmap(lambda st, th: sampler.reset(model, st, th))(
        states_w, theta_model)
    C = n_chains
    if isinstance(sampler, HMC):
        if sampler.tuner is not None:
            dt = states.tune.step_size.dtype
            states = states.replace(tune=TuneState(
                step_size=jnp.full((C,), eps, dt),
                n_leaps=jnp.full((C,), nl, jnp.int32),
                accepted=jnp.zeros((C,), jnp.int32),
                proposed=jnp.zeros((C,), jnp.int32)))
        states = states.replace(i=states.i + steps2)
    else:  # HMCDA
        dt = states.leap_step.dtype
        epsv = jnp.full((C,), eps, dt)
        states = states.replace(leap_step=epsv, dual_leap_step=epsv,
                                i=states.i + steps2)
    return infos, states
