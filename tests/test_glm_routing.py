"""model(glm=...) + fused-kernel routing through the standard run()/prun API.

The fused Pallas path (ops/glm_hmc.py) must be reachable from the normal
multi-chain surface — `mc.run(task, chains=N, fused=True)` — and produce
chains statistically identical to the generic vmapped engine, with resumable
HMCState finals."""
import jax
import jax.numpy as jnp
import numpy as np

import mcmc_jl_tpu as mc


def _data(n=90, d=4, seed=3):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(n), rng.standard_normal((n, d - 1))])
    beta = rng.standard_normal(d) * 0.7
    Y = (rng.random(n) < 1.0 / (1.0 + np.exp(-X @ beta))).astype(np.float64)
    return X, Y


def test_glm_model_matches_manual_logp():
    X, Y = _data()
    rng = np.random.default_rng(0)
    w = rng.uniform(0.5, 2.0, X.shape[0])
    o = 0.2 * rng.standard_normal(X.shape[0])
    m = mc.model(glm=("logistic", X, Y), weights=w, offsets=o, prior_prec=2.0)
    th = jnp.asarray(rng.standard_normal(4) * 0.3)
    z = jnp.asarray(X) @ th + jnp.asarray(o)
    want = (jnp.sum(jnp.asarray(w) * (z * jnp.asarray(Y) - jnp.logaddexp(0.0, z)))
            - 1.0 * th @ th)
    np.testing.assert_allclose(float(m.eval(th)), float(want), rtol=1e-10)
    g_auto = jax.grad(lambda t: m.eval(t))(th)
    np.testing.assert_allclose(np.asarray(m.evalg(th)), np.asarray(g_auto),
                               atol=1e-8)


def test_fused_routing_matches_generic():
    X, Y = _data()
    m = mc.model(glm=("logistic", X, Y))
    task = m * mc.HMC(5, 0.1) * mc.SerialMC(steps=800, burnin=200)

    chains_fused = mc.run(task, chains=8, seed=0, fused=True)
    chains_gen = mc.run(task, chains=8, seed=0, fused=False)
    assert len(chains_fused) == 8

    def pooled_mean(chains):
        return np.mean([c.samples.values.mean(0) for c in chains], axis=0)

    mu_f, mu_g = pooled_mean(chains_fused), pooled_mean(chains_gen)
    se = np.sqrt(np.mean([mc.var(c) for c in chains_gen], axis=0) / 8)
    assert np.all(np.abs(mu_f - mu_g) < 6 * se + 0.05), (mu_f, mu_g, se)

    c0 = chains_fused[0]
    # full protocol present
    for k in ("accept", "logtarget"):
        assert k in c0.diagnostics
    assert c0.gradients.shape[0] == c0.samples.shape[0]  # pgrads stored
    acc = mc.acceptance(c0)
    assert acc > 40, acc

    # resume continues from the fused final state through the generic path
    c1 = mc.resume(c0, steps=100)
    assert np.all(np.isfinite(c1.samples.values))


def test_fused_routing_requires_plain_hmc():
    X, Y = _data()
    m = mc.model(glm=("logistic", X, Y))
    from mcmc_jl_tpu.parallel.pchains import _fused_eligible
    from mcmc_jl_tpu.core.task import MCMCTask

    r = mc.SerialMC(steps=100, burnin=10)
    assert _fused_eligible(MCMCTask(m, mc.HMC(5, 0.1), r))
    assert not _fused_eligible(MCMCTask(m, mc.HMC(5, 0.1, mass_adapt=True), r))
    assert not _fused_eligible(
        MCMCTask(m, mc.HMC(5, 0.1, mc.EmpMCTuner(0.8)), r))
    assert not _fused_eligible(MCMCTask(m, mc.NUTS(), r))
    m2 = mc.model(lambda v: -v @ v, gradient=True, init=jnp.zeros(2),
                  check_init=False)
    assert not _fused_eligible(MCMCTask(m2, mc.HMC(5, 0.1), r))


def test_fused_logtarget_diag_is_exact():
    """Padded momentum lanes must not leak into the Hamiltonian: the
    fused path's logtarget diagnostic equals the true model log-density at
    the stored samples (review finding: up to ~70 nats off before)."""
    X, Y = _data(n=60, d=4, seed=5)
    m = mc.model(glm=("logistic", X, Y))
    task = m * mc.HMC(5, 0.1) * mc.SerialMC(steps=200, burnin=50)
    c = mc.run(task, chains=2, seed=0, fused=True)[0]
    lp_true = np.array([float(m.eval(jnp.asarray(row, jnp.float32)))
                        for row in c.samples.values])
    np.testing.assert_allclose(c.diagnostics["logtarget"], lp_true,
                               rtol=1e-4, atol=5e-3)


def test_glmspec_identity_hash():
    X, Y = _data(n=30, d=3, seed=6)
    m = mc.model(glm=("logistic", X, Y))
    hash(m.glm_spec)  # must not raise
    assert m.glm_spec == m.glm_spec
    assert m.glm_spec != mc.model(glm=("logistic", X, Y)).glm_spec


def test_fused_routing_multistage_integrator():
    """HMC(integrator="2stage") on a GLM posterior routes through the fused
    kernel (which implements the scheme) and matches the generic engine."""
    from mcmc_jl_tpu.core.task import MCMCTask
    from mcmc_jl_tpu.parallel.pchains import _fused_eligible

    X, Y = _data()
    m = mc.model(glm=("logistic", X, Y))
    r = mc.SerialMC(steps=800, burnin=200)
    s = mc.HMC(4, 0.2, integrator="2stage")
    assert _fused_eligible(MCMCTask(m, s, r))

    task = m * s * r
    chains_fused = mc.run(task, chains=8, seed=0, fused=True)
    chains_gen = mc.run(task, chains=8, seed=0, fused=False)
    mu_f = np.mean([c.samples.values.mean(0) for c in chains_fused], axis=0)
    mu_g = np.mean([c.samples.values.mean(0) for c in chains_gen], axis=0)
    se = np.sqrt(np.mean([mc.var(c) for c in chains_gen], axis=0) / 8)
    assert np.all(np.abs(mu_f - mu_g) < 6 * se + 0.05), (mu_f, mu_g)


def test_target_routing_matches_generic():
    """Non-GLM data-free model: fused=True routes through the custom-target
    kernel (ops/pallas_target.py) and matches the generic engine
    statistically; resume continues through the generic path."""
    d = 3

    def logp(v):
        return -0.5 * jnp.sum((v - 1.0) ** 2 / 4.0)

    m = mc.model(logp, gradient=True, init=jnp.zeros(d), check_init=False)
    task = m * mc.HMC(6, 0.5) * mc.SerialMC(steps=600, burnin=200)

    from mcmc_jl_tpu.parallel.pchains import _fused_eligible, _target_eligible
    from mcmc_jl_tpu.core.task import MCMCTask

    assert not _fused_eligible(MCMCTask(m, mc.HMC(6, 0.5), task.runner))
    assert _target_eligible(MCMCTask(m, mc.HMC(6, 0.5), task.runner))

    chains_fused = mc.run(task, chains=8, seed=0, fused=True)
    chains_gen = mc.run(task, chains=8, seed=0, fused=False)

    def pooled(chains):
        return np.concatenate([c.samples.values for c in chains], axis=0)

    sf, sg = pooled(chains_fused), pooled(chains_gen)
    se = sg.std(0) / np.sqrt(np.mean([mc.ess(c) for c in chains_gen]) * 8)
    assert np.all(np.abs(sf.mean(0) - 1.0) < 8 * se + 0.05), (sf.mean(0), se)
    assert np.all(np.abs(sf.std(0) - 2.0) < 0.3), sf.std(0)

    c0 = chains_fused[0]
    assert c0.gradients.shape[0] == c0.samples.shape[0]
    assert mc.acceptance(c0) > 40
    c1 = mc.resume(c0, steps=50)
    assert np.all(np.isfinite(c1.samples.values))


def test_fused_mala_routing_matches_generic():
    """Plain MALA routes through the fused kernels via the one-leapfrog
    HMC equivalence (drift step s == eps^2; MALA.jl:65-126 vs
    HMC.jl:93-102) — on BOTH the GLM and the custom-target paths
    (VERDICT r4 stretch #10)."""
    X, Y = _data()
    m = mc.model(glm=("logistic", X, Y))
    task = m * mc.MALA(0.02) * mc.SerialMC(steps=1200, burnin=300)

    chains_fused = mc.run(task, chains=8, seed=0, fused=True)
    chains_gen = mc.run(task, chains=8, seed=0, fused=False)

    def pooled_mean(chains):
        return np.mean([c.samples.values.mean(0) for c in chains], axis=0)

    mu_f, mu_g = pooled_mean(chains_fused), pooled_mean(chains_gen)
    se = np.sqrt(np.mean([mc.var(c) for c in chains_gen], axis=0) / 8)
    assert np.all(np.abs(mu_f - mu_g) < 6 * se + 0.05), (mu_f, mu_g, se)
    # acceptance statistics must agree too (the MH ratio is identical)
    acc_f = np.mean([mc.acceptance(c) for c in chains_fused])
    acc_g = np.mean([mc.acceptance(c) for c in chains_gen])
    assert abs(acc_f - acc_g) < 12, (acc_f, acc_g)

    # final states are exact-resume MALAStates
    from mcmc_jl_tpu.samplers.mala import MALAState

    st = chains_fused[0].task.state
    assert isinstance(st, MALAState)
    c1 = mc.resume(chains_fused[0], steps=100)
    assert np.all(np.isfinite(c1.samples.values))

    # custom-target path (data-free model)
    m2 = mc.model(lambda v: -0.5 * (4.0 * v[0] * v[0] + v[1] * v[1]),
                  gradient=True, init=jnp.zeros(2), check_init=False)
    task2 = m2 * mc.MALA(0.1) * mc.SerialMC(steps=1200, burnin=300)
    cf = mc.run(task2, chains=8, seed=0, fused=True)
    cg = mc.run(task2, chains=8, seed=0, fused=False)
    mu_f2, mu_g2 = pooled_mean(cf), pooled_mean(cg)
    se2 = np.sqrt(np.mean([mc.var(c) for c in cg], axis=0) / 8)
    assert np.all(np.abs(mu_f2 - mu_g2) < 6 * se2 + 0.05)
    var_f = np.mean([c.samples.values.var(0) for c in cf], axis=0)
    np.testing.assert_allclose(var_f, [0.25, 1.0], rtol=0.3)
