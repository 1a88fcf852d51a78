"""Data-bearing custom targets on the fused kernel (round 4).

Pallas rejects captured array constants, so models that close over data
previously fell back to the generic engine.  ``lifted_model_block``
closure-converts the model's ``eval``: every hoisted array rides a
replicated (1, size) VMEM row into the kernel, like the GLM kernel's
design matrix — any data-bearing model whose math Mosaic can lower gets
the fused path (headline case: the reference's Ornstein AR(1) likelihood,
examples/ornstein.jl).
"""
import numpy as np
import jax
import jax.numpy as jnp

import mcmc_jl_tpu as mc
from mcmc_jl_tpu.core.task import MCMCTask
from mcmc_jl_tpu.ops.pallas_target import (
    lifted_model_block, run_target_hmc, target_kernel_supported)
from mcmc_jl_tpu.ops.warmstart import warm_eligible


def _data_model(n=60, seed=2):
    """Nonlinear-in-theta regression y = a * exp(-b t) + eps: NOT a GLM,
    closes over two data arrays."""
    rng = np.random.default_rng(seed)
    t = jnp.asarray(np.linspace(0.1, 3.0, n))
    y = jnp.asarray(2.0 * np.exp(-0.7 * np.linspace(0.1, 3.0, n))
                    + 0.1 * rng.standard_normal(n))

    def logp(v):
        a, b = v[0], v[1]
        resid = y - a * jnp.exp(-b * t)
        return (-0.5 * jnp.sum(resid * resid) / 0.01
                - 0.5 * (a * a + b * b) / 100.0)

    return mc.model(logp, gradient=True, init=jnp.array([1.0, 0.5]),
                    check_init=False)


def test_lifted_block_hoists_data_and_matches_eval():
    m = _data_model()
    lifted = lifted_model_block(m)
    assert lifted is not None
    logp_block, consts = lifted
    assert len(consts) >= 2  # t and y hoisted (plus any scalars)
    assert all(c.ndim == 2 and c.shape[0] == 1 for c in consts)
    theta = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 128)), jnp.float32).at[:, 2:].set(0.0)
    lp = logp_block(theta, *consts)[:, 0]
    lp_ref = jnp.stack([m.eval(theta[i, :2].astype(m.init.dtype))
                        for i in range(4)])
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=1e-4, atol=1e-2)


def test_lifted_probe_and_run():
    m = _data_model()
    logp_block, consts = lifted_model_block(m)
    assert target_kernel_supported(logp_block, 128, 64, consts=consts) \
        or jax.default_backend() == "cpu"  # CPU probes interpret=False
    theta, infos = run_target_hmc(
        logp_block, 2, 16, 300, n_leaps=5, eps=0.02, seed=0,
        inits=jnp.broadcast_to(jnp.array([2.0, 0.7], jnp.float32), (16, 2)),
        interpret=True, consts=consts, collect=True)
    assert np.all(np.isfinite(np.asarray(theta)))
    assert float(np.mean(np.asarray(infos["accept"]))) > 0.3


def test_data_model_fused_matches_generic():
    """End-to-end: plain HMC on the data-bearing model through the fused
    route (fused=True) matches the generic engine."""
    m = _data_model()
    task = m * mc.HMC(5, 0.02) * mc.SerialMC(steps=600, burnin=200)
    chains_f = mc.run(task, chains=6, seed=0, fused=True)
    chains_g = mc.run(task, chains=6, seed=0, fused=False)
    mu_f = np.mean([c.samples.values.mean(0) for c in chains_f], axis=0)
    mu_g = np.mean([c.samples.values.mean(0) for c in chains_g], axis=0)
    se = np.sqrt(np.mean([mc.var(c) for c in chains_g], axis=0) / 6)
    assert np.all(np.abs(mu_f - mu_g) < 6 * se + 0.02), (mu_f, mu_g)
    # posterior concentrates near the truth (a=2, b=0.7)
    assert abs(mu_f[0] - 2.0) < 0.3 and abs(mu_f[1] - 0.7) < 0.2


def test_ornstein_reference_workload_fused():
    """The reference's Ornstein example (AR(1) residual likelihood closing
    over the series) reaches the fused path, adaptive warm pipeline
    included (diag-mass fold: the three parameters live on wildly
    different scales).  Inits near the posterior — the example's far-off
    defaults defeat plain tuned HMC on ANY engine (generic included);
    the example itself samples them with RAM/NUTS + scale hints."""
    import examples.ornstein as oe

    import dataclasses

    x = oe.make_series(duration=200)
    m = dataclasses.replace(oe.make_model(x),
                            init=jnp.asarray([15.0, 0.15, 9.0]))
    r = mc.SerialMC(steps=700, burnin=300)
    s = mc.HMC(5, 0.01, mc.EmpMCTuner(0.8, adapt_step=50),
               mass_adapt="diag")
    assert warm_eligible(MCMCTask(m, s, r))

    chains_f = mc.run(m * s * r, chains=6, seed=0, fused=True)
    chains_g = mc.run(m * s * r, chains=6, seed=0, fused=False)
    cm_f = np.array([c.samples.values.mean(0) for c in chains_f])
    cm_g = np.array([c.samples.values.mean(0) for c in chains_g])
    mu_f, mu_g = cm_f.mean(0), cm_g.mean(0)
    # between-chain spread as the MC scale: tau mixes slowly, so a
    # marginal-variance se would badly understate the MCSE
    se = (cm_f.std(0) + cm_g.std(0)) / np.sqrt(6)
    assert np.all(np.abs(mu_f - mu_g) < 4 * se + 0.1), (mu_f, mu_g, se)
    assert np.mean([mc.acceptance(c) for c in chains_f]) > 30
    # posterior near the generating values (mu0=10, sigma0=0.1)
    assert abs(mu_f[2] - 10.0) < 1.0 and abs(mu_f[1] - 0.1) < 0.1


def test_lifted_budget_rejects_oversize_data():
    big = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4 * 1024 * 1024,)), jnp.float32)  # 16 MB > MAX_CONST_BYTES

    def logp(v):
        return -0.5 * jnp.sum((big[:8] - v) ** 2) - 1e-9 * jnp.sum(big)

    m = mc.model(logp, gradient=True, init=jnp.zeros(8), check_init=False)
    assert lifted_model_block(m) is None
    # FORCED fused routing must also degrade to the generic engine rather
    # than hard-fail on the over-budget model (review regression)
    chains = mc.run(m * mc.HMC(3, 0.05) * mc.SerialMC(steps=20), chains=2,
                    seed=0, fused=True)
    assert np.all(np.isfinite(chains[0].samples.values))
