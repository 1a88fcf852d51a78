"""The reference's example workloads (SURVEY §2.6), scaled for CI, with
posterior-moment gates.

Linear regression has a closed-form posterior (Gaussian prior + Gaussian
likelihood => ridge posterior), giving an exact oracle: sampled moments must
match N((X'X+I)^-1 X'Y, (X'X+I)^-1) within Monte-Carlo error — the
BASELINE.md "posteriors within MC error" criterion."""
import sys
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_jl_tpu as mc

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "examples"))


def test_linear_regression_posterior_matches_analytic():
    rng = np.random.default_rng(1)
    n, nbeta = 200, 5
    X = np.column_stack([np.ones(n), rng.standard_normal((n, nbeta - 1))])
    beta0 = rng.standard_normal(nbeta)
    Y = X @ beta0 + rng.standard_normal(n)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def ex(vars):
        mc.tilde(vars, mc.Normal(0.0, 1.0))
        mc.tilde(Yj - Xj @ vars, mc.Normal(0.0, 1.0))

    m = mc.model(ex, vars=np.zeros(nbeta), gradient=True)

    # analytic ridge posterior
    P = X.T @ X + np.eye(nbeta)
    cov = np.linalg.inv(P)
    mean = cov @ (X.T @ Y)

    chain = mc.run(m * mc.HMC(10, 0.05) * mc.SerialMC(range(500, 8001)), seed=0)
    mc_mean = mc.mean(chain)
    mcse = np.sqrt(mc.var(chain))
    # |z| <= 5 MC-stderr per coordinate (test_ss.jl-style gate)
    z = np.abs(mc_mean - mean) / np.maximum(mcse, 1e-12)
    assert np.all(z < 5), (z, mc_mean, mean)
    # marginal posterior sd within 15%
    sd = chain.samples.values.std(axis=0, ddof=1)
    np.testing.assert_allclose(sd, np.sqrt(np.diag(cov)), rtol=0.15)

    # RAM reaches the same posterior
    chain2 = mc.run(m * mc.RAM(1.0, 0.3) * mc.SerialMC(range(2000, 20001, 2)),
                    seed=1)
    z2 = np.abs(mc.mean(chain2) - mean) / np.maximum(np.sqrt(mc.var(chain2)), 1e-12)
    assert np.all(z2 < 6), z2


def test_logistic_regression_example():
    import logistic_regression as lre

    X, Y, beta0 = lre.make_data(n=300, nbeta=6)
    m = lre.make_model(X, Y, nbeta=6)
    c_hmc = mc.run(m * mc.HMC(5, 0.1) * mc.SerialMC(range(500, 4001)), seed=0)
    c_nuts = mc.run(m * mc.NUTS() * mc.SerialMC(range(500, 4001)), seed=1)
    assert mc.acceptance(c_hmc) > 40
    # the two samplers agree on the posterior mean within MC error
    se = np.sqrt(mc.var(c_hmc)) + np.sqrt(mc.var(c_nuts))
    diff = np.abs(mc.mean(c_hmc) - mc.mean(c_nuts))
    assert np.all(diff < 6 * se + 0.05), (diff, se)
    # and correlate strongly with the generating coefficients
    assert np.corrcoef(mc.mean(c_hmc), beta0)[0, 1] > 0.9


def test_ornstein_example():
    import ornstein as orn

    x = orn.make_series(duration=400)
    m = orn.make_model(x)
    chain = mc.run(m * mc.RAM() * mc.SerialMC(range(1000, 6001)), seed=0)
    est = mc.mean(chain)  # tau, sigma, mu
    # generating values: tau0=20, sigma0=0.1, mu0=10 (short series -> loose)
    assert 2 < est[0] < 100, est
    assert 0.05 < est[1] < 0.3, est
    assert 8 < est[2] < 12, est
    # NUTS runs on it too
    c2 = mc.run(m * mc.NUTS() * mc.SerialMC(range(200, 601)), seed=1)
    assert "ndoublings" in c2.diagnostics


def test_probit_example_manifold_samplers():
    import probit_regression as pr

    X, y = pr.make_data(n=60)
    m = pr.make_model(X, y)
    assert m.hasgradient and m.hastensor and m.hasdtensor

    c_rwm = mc.run(m * mc.RWM(0.5) * mc.SerialMC(range(500, 3001)), seed=0)
    c_smm = mc.run(m * mc.SMMALA(0.5) * mc.SerialMC(range(500, 3001)), seed=1)
    c_pml = mc.run(m * mc.PMALA(0.5) * mc.SerialMC(range(500, 3001)), seed=2)
    assert mc.acceptance(c_smm) > 20
    # manifold samplers agree with RWM on the posterior mean
    for c in (c_smm, c_pml):
        se = np.sqrt(mc.var(c_rwm)) + np.sqrt(mc.var(c))
        diff = np.abs(mc.mean(c_rwm) - mc.mean(c))
        assert np.all(diff < 8 * se + 0.1), (diff, se)

    # RMHMC with tuner (the example's config, scaled down)
    c_rm = mc.run(m * mc.RMHMC(3, 0.5, mc.EmpMCTuner(0.8)) *
                  mc.SerialMC(range(200, 1201)), seed=3)
    assert np.all(np.isfinite(c_rm.samples.values))


def test_probit_vaso_posterior_parity():
    """The REAL vaso dataset (the reference's fixture, vendored verbatim —
    probit_regression.jl:7-16 / examples/vaso.txt): posterior means from
    SMMALA, PMALA and RMHMC agree within MC error on the reference's model
    config (N(0, 100 I) prior, standardized covariates + intercept)."""
    import probit_regression as pr

    X, y = pr.make_data()  # defaults to the shipped vaso.txt
    assert X.shape == (39, 3)
    # the fixture is vendored byte-identical to the reference's
    import numpy as _np
    ref = _np.loadtxt(pr.VASO)
    assert ref.shape == (39, 3) and set(_np.unique(ref[:, 2])) <= {0.0, 1.0}

    m = pr.make_model(X, y)
    chains = {
        "SMMALA": mc.run(m * mc.SMMALA(0.5) * mc.SerialMC(range(500, 3501)),
                         seed=1),
        "PMALA": mc.run(m * mc.PMALA(0.5) * mc.SerialMC(range(500, 3501)),
                        seed=2),
        "RMHMC": mc.run(m * mc.RMHMC(3, 0.5, mc.EmpMCTuner(0.8)) *
                        mc.SerialMC(range(500, 3501)), seed=3),
    }
    means = {k: mc.mean(c) for k, c in chains.items()}
    ses = {k: np.sqrt(np.asarray(mc.var(c)) /
                      np.maximum(np.asarray(mc.ess(c)), 4.0))
           for k, c in chains.items()}
    names = list(chains)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            diff = np.abs(np.asarray(means[a]) - np.asarray(means[b]))
            tol = 6 * (ses[a] + ses[b]) + 0.05
            assert np.all(diff < tol), (a, b, diff, tol)


def test_fd_gradient_of_probit_analytic_derivatives():
    """The probit example supplies analytic grad/tensor/dtensor
    (reference probit_regression.jl:36-67); check grad vs jax.grad."""
    import jax
    import probit_regression as pr

    X, y = pr.make_data(n=40)
    m = pr.make_model(X, y)
    theta = jnp.asarray(np.random.default_rng(0).standard_normal(m.size) * 0.3)
    lp, g_analytic = m.evalallg(theta)
    g_auto = jax.grad(m.eval)(theta)
    np.testing.assert_allclose(np.asarray(g_analytic), np.asarray(g_auto),
                               rtol=1e-6, atol=1e-8)
    # tensor is SPD at moderate theta
    G = np.asarray(m.evalt(theta))
    assert np.all(np.linalg.eigvalsh(G) > 0)


def test_poisson_regression_example():
    """Poisson-with-exposure example: posterior covers the truth."""
    import poisson_regression as ex

    X, Y, log_e, beta_true = ex.make_data(n=250, seed=7)
    m = ex.make_model(X, Y, log_e)
    chain = mc.run(m * mc.NUTS() * mc.SerialMC(steps=2000, burnin=800), seed=0)
    est = chain.samples.values.mean(axis=0)
    se = np.sqrt(mc.var(chain))
    # Poisson GLM posterior sd also includes likelihood curvature; gate at
    # 6 combined sigmas of (MC error + rough Fisher sd)
    fisher_sd = np.sqrt(np.diag(np.linalg.inv(
        X.T @ (np.exp(log_e + X @ beta_true)[:, None] * X) + 0.01 * np.eye(3))))
    assert np.all(np.abs(est - beta_true) < 6 * (se + fisher_sd)), (
        est, beta_true, se, fisher_sd)


def test_funnel_example():
    """examples/funnel.py (reference workload: test/test_ss.jl), scaled for
    CI: slice_sample and WALNUTS both recover the v-marginal neck."""
    import funnel

    m = funnel.make_model()
    c = mc.run(m, mc.WALNUTS(maxdoublings=7, max_halvings=5),
               mc.SerialMC(steps=4000, burnin=1000), seed=0)
    v = c.samples.values[:, 0]
    assert abs(v.mean()) < 1.0 and v.var() > 5.5, (v.mean(), v.var())

    xs = funnel.mc.slice_sample(m.eval, jnp.zeros(funnel.DIM_X + 1), 3000,
                                widths=5.0, seed=0)
    vs = np.asarray(xs)[1000:, 0]
    assert abs(vs.mean()) < 1.0 and vs.var() > 5.0, (vs.mean(), vs.var())


def test_model_comparison_example():
    """examples/model_comparison.py: the three logZ estimators agree with
    the analytic conjugate evidence (scaled down for CI)."""
    import model_comparison as mcmp
    import jax

    exact = mcmp.analytic_logz()
    m1 = mc.model(mcmp.logp, gradient=True, init=jnp.zeros(1))
    smc = mc.run(
        m1 * mc.RWM(0.4) * mc.ASMC(particles=1024, moves=2,
                                   logprior=mcmp.logprior,
                                   prior_sample=lambda k:
                                   jax.random.normal(k, (1,))),
        seed=1,
    )
    assert abs(smc.diagnostics["logz"] - exact) < 0.4


def test_eight_schools_matches_exact_quadrature():
    """Hierarchical 8-schools (non-centered, DSL with acc() Jacobian):
    NUTS + run_until posterior matches the analytic (mu, tau) marginal
    computed by quadrature."""
    import eight_schools as es

    m = es.make_model()
    res = mc.run_until(m, mc.NUTS(mass_adapt=True), n_chains=8,
                       rhat_target=1.02, min_ess=600, check_every=400,
                       max_steps=4000, seed=3)
    assert res.converged, res.history
    draws = res.samples.reshape(-1, m.size)
    mu, tau = draws[:, 0], np.exp(draws[:, 1])
    mu_mean, mu_sd, tau_median = es.exact_posterior()
    se = mu_sd / np.sqrt(res.min_ess)
    assert abs(mu.mean() - mu_mean) < 6 * se + 0.2, (mu.mean(), mu_mean)
    assert abs(mu.std() - mu_sd) < 0.5, (mu.std(), mu_sd)
    assert abs(np.median(tau) - tau_median) < 0.6, (np.median(tau),
                                                    tau_median)


def test_acc_outside_trace_raises():
    with pytest.raises(RuntimeError):
        mc.acc(1.0)


def test_warmstart_example():
    """examples/warmstart_logistic.py: adaptive HMC through the warm-start
    pipeline recovers the generating coefficients."""
    import warmstart_logistic as ws

    chains = ws.main(n=200, nbeta=4, chains=4, steps=600, burnin=200)
    X, Y, beta0 = ws.make_data(200, 4)
    pooled = np.mean([c.samples.values.mean(0) for c in chains], axis=0)
    sd = np.mean([np.sqrt(mc.var(c)) for c in chains], axis=0)
    assert np.all(np.abs(pooled - beta0) < 5 * sd + 0.5), (pooled, beta0)
