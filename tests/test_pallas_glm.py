"""Pallas fused GLM-HMC kernel correctness (interpret mode on CPU).

Checks the fused trajectory against the generic jnp leapfrog bit-for-bit
(same math, f32), and the full fused sampler statistically against the
posterior sampled by the generic HMC path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmc_jl_tpu.ops.glm_hmc import run_glm_hmc
from mcmc_jl_tpu.ops.pallas_glm import (
    glm_hmc_leapfrogs, pad_chains, pad_design,
)


def _data(n=64, d=6, seed=0):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(n), rng.standard_normal((n, d - 1))])
    beta = rng.standard_normal(d) * 0.5
    Y = (rng.random(n) < 1.0 / (1.0 + np.exp(-X @ beta))).astype(np.float32)
    return X.astype(np.float32), Y


def _reference_leapfrogs(X, Y, theta, m, grad, eps, n_leaps):
    """Plain-jnp f32 reference of the same trajectory."""
    X = jnp.asarray(X, jnp.float32)
    Y = jnp.asarray(Y, jnp.float32)

    def logp_grad(th):
        logits = th @ X.T
        p = jax.nn.sigmoid(logits)
        g = (Y - p) @ X - th
        lp = (logits @ Y - jnp.sum(jax.nn.softplus(logits), axis=1)
              - 0.5 * jnp.sum(th * th, axis=1))
        return lp, g

    for _ in range(n_leaps):
        m = m + 0.5 * eps * grad
        theta = theta + eps * m
        lp, grad = logp_grad(theta)
        m = m + 0.5 * eps * grad
    lp, grad = logp_grad(theta)
    return theta, m, grad, lp


def test_kernel_matches_reference_trajectory():
    X, Y = _data()
    C, d = 8, X.shape[1]
    rng = np.random.default_rng(1)
    theta = jnp.asarray(rng.standard_normal((C, d)) * 0.1, jnp.float32)
    m = jnp.asarray(rng.standard_normal((C, d)), jnp.float32)

    XT, Y2, d_pad = pad_design(X, Y)
    th_p = pad_chains(theta, d_pad)
    m_p = pad_chains(m, d_pad)

    # gradient at start
    logits = theta @ jnp.asarray(X).T
    g = (jnp.asarray(Y) - jax.nn.sigmoid(logits)) @ jnp.asarray(X) - theta
    g_p = pad_chains(g, d_pad)

    th1, m1, g1, lp1 = glm_hmc_leapfrogs(
        XT, Y2, th_p, m_p, g_p, 0.1, n_leaps=5, block_chains=8, interpret=True
    )
    th2, m2, g2, lp2 = _reference_leapfrogs(X, Y, theta, m, g, jnp.float32(0.1), 5)

    np.testing.assert_allclose(np.asarray(th1[:, :d]), np.asarray(th2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m1[:, :d]), np.asarray(m2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                               rtol=2e-5, atol=2e-4)
    # padded lanes stay exactly zero
    assert np.all(np.asarray(th1[:, d:]) == 0)
    assert np.all(np.asarray(g1[:, d:]) == 0)


def test_fused_sampler_posterior_matches_generic():
    X, Y = _data(n=80, d=4, seed=3)
    theta, infos = run_glm_hmc(X, Y, n_chains=32, steps=600, n_leaps=5,
                               eps=0.1, seed=0, interpret=True)
    acc = np.mean(np.asarray(infos["accept"]))
    assert acc > 0.5, acc
    lp = np.asarray(infos["plogtarget"])
    assert np.all(np.isfinite(lp))

    # posterior mean against the generic framework path
    import mcmc_jl_tpu as mc
    from mcmc_jl_tpu.parallel import run_chains

    Xj, Yj = jnp.asarray(X, jnp.float64), jnp.asarray(Y, jnp.float64)

    def logp(t):
        logits = Xj @ t
        return (jnp.dot(Yj, logits) - jnp.sum(jnp.logaddexp(0.0, logits))
                - 0.5 * jnp.dot(t, t))

    model = mc.model(logp, gradient=True, init=jnp.zeros(4), check_init=False)
    ginfos, _, _ = run_chains(model, mc.HMC(5, 0.1),
                              mc.SerialMC(steps=600, burnin=200), 16, seed=1,
                              jitter=0.1)
    gen_mean = np.asarray(ginfos["ppars"])[200:].mean(axis=(0, 1))

    fused_mean = np.asarray(infos_to_samples(infos, theta)).mean(axis=0)
    np.testing.assert_allclose(fused_mean, gen_mean, atol=0.15)


def infos_to_samples(infos, theta_final):
    # we only kept plogtarget per step in infos; use final thetas across chains
    return theta_final


@pytest.mark.parametrize("kind", ["linear", "probit"])
def test_other_links_match_autodiff(kind):
    """linear/probit link kernels agree with jax.grad of the same logp."""
    rng = np.random.default_rng(5)
    n, d = 48, 5
    X = np.column_stack([np.ones(n), rng.standard_normal((n, d - 1))]).astype(np.float32)
    if kind == "linear":
        Y = (X @ rng.standard_normal(d) + rng.standard_normal(n)).astype(np.float32)
    else:
        Y = (rng.random(n) < 0.5).astype(np.float32)

    from mcmc_jl_tpu.ops.pallas_glm import link_terms

    ll_fn, resid_fn = link_terms(kind)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def logp(th):
        z = Xj @ th
        return jnp.sum(ll_fn(z, Yj)) - 0.5 * th @ th

    theta = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.2)
    lp, g_auto = jax.value_and_grad(logp)(theta)
    # kernel gradient via one zero-step trajectory (n_leaps=0 not allowed;
    # call kernel pieces directly)
    XT, Y2, d_pad = pad_design(X, Y)
    th_p = pad_chains(theta[None, :], d_pad)
    g_seed = jnp.zeros_like(th_p)
    m0 = jnp.zeros_like(th_p)
    # eps=0 trajectory: positions unchanged; kernel recomputes lp/grad at end
    th1, m1, g1, lp1 = glm_hmc_leapfrogs(
        XT, Y2, th_p, m0, g_seed, 0.0, n_leaps=1, block_chains=1,
        interpret=True, kind=kind,
    )
    np.testing.assert_allclose(float(lp1[0]), float(lp), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[0, :d]), np.asarray(g_auto),
                               rtol=2e-4, atol=2e-4)


def test_linear_link_posterior_matches_ridge():
    """Fused linear-link HMC recovers the analytic ridge posterior."""
    rng = np.random.default_rng(7)
    n, d = 120, 4
    X = np.column_stack([np.ones(n), rng.standard_normal((n, d - 1))]).astype(np.float32)
    beta = rng.standard_normal(d)
    Y = (X @ beta + rng.standard_normal(n)).astype(np.float32)

    theta, infos = run_glm_hmc(X, Y, n_chains=64, steps=400, n_leaps=5,
                               eps=0.05, seed=0, interpret=True, kind="linear")
    P = X.T @ X + np.eye(d)
    mean = np.linalg.solve(P, X.T @ Y)
    est = np.asarray(theta).mean(0)
    np.testing.assert_allclose(est, mean, atol=0.2)


def test_weights_offsets_prior_match_autodiff():
    """Weighted + offset GLM with non-unit prior precision: kernel lp/grad
    agree with jax.grad of the same weighted logp."""
    rng = np.random.default_rng(11)
    n, d = 40, 4
    X = np.column_stack([np.ones(n), rng.standard_normal((n, d - 1))]).astype(np.float32)
    Y = (rng.random(n) < 0.5).astype(np.float32)
    w = rng.uniform(0.5, 3.0, n).astype(np.float32)
    o = rng.standard_normal(n).astype(np.float32) * 0.3
    lam = 2.5

    Xj, Yj, wj, oj = map(jnp.asarray, (X, Y, w, o))

    def logp(th):
        z = Xj @ th + oj
        ll = z * Yj - jnp.logaddexp(0.0, z)
        return jnp.sum(wj * ll) - 0.5 * lam * th @ th

    theta = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.2)
    lp, g_auto = jax.value_and_grad(logp)(theta)

    XT, Y2, d_pad = pad_design(X, Y)
    th_p = pad_chains(theta[None, :], d_pad)
    th1, m1, g1, lp1 = glm_hmc_leapfrogs(
        XT, Y2, th_p, jnp.zeros_like(th_p), jnp.zeros_like(th_p), 0.0,
        n_leaps=1, block_chains=1, interpret=True,
        weights=w, offsets=o, prior_prec=lam,
    )
    np.testing.assert_allclose(float(lp1[0]), float(lp), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[0, :d]), np.asarray(g_auto),
                               rtol=2e-4, atol=2e-4)


def test_custom_link_exponential_survival():
    """User-supplied (ll, resid) pair runs in the fused kernel: exponential
    survival with log-rate link, y ~ Exp(rate = exp(z))."""
    rng = np.random.default_rng(13)
    n, d = 60, 3
    X = np.column_stack([np.ones(n), rng.standard_normal((n, d - 1))]).astype(np.float32)
    beta = np.array([0.3, -0.5, 0.2])
    Y = rng.exponential(1.0 / np.exp(X @ beta)).astype(np.float32)

    custom = (
        lambda z, y: z - y * jnp.exp(z),          # loglik
        lambda z, y: 1.0 - y * jnp.exp(z),        # d loglik / dz
    )

    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def logp(th):
        z = Xj @ th
        return jnp.sum(z - Yj * jnp.exp(z)) - 0.5 * th @ th

    theta = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1)
    lp, g_auto = jax.value_and_grad(logp)(theta)

    XT, Y2, d_pad = pad_design(X, Y)
    th_p = pad_chains(theta[None, :], d_pad)
    th1, m1, g1, lp1 = glm_hmc_leapfrogs(
        XT, Y2, th_p, jnp.zeros_like(th_p), jnp.zeros_like(th_p), 0.0,
        n_leaps=1, block_chains=1, interpret=True, kind=custom,
    )
    np.testing.assert_allclose(float(lp1[0]), float(lp), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[0, :d]), np.asarray(g_auto),
                               rtol=2e-4, atol=2e-4)

    # full fused sampler with the custom link recovers beta
    theta_s, infos = run_glm_hmc(X, Y, n_chains=64, steps=500, n_leaps=5,
                                 eps=0.04, seed=0, interpret=True, kind=custom)
    assert np.mean(np.asarray(infos["accept"])) > 0.5
    np.testing.assert_allclose(np.asarray(theta_s).mean(0), beta, atol=0.35)


@pytest.mark.parametrize("integ", ["2stage", "3stage"])
def test_kernel_multistage_matches_generic_integrator(integ):
    """The kernel's trace-time 2/3-stage bodies must match the generic
    samplers/integrators.py schemes bit-for-bit (same f32 math)."""
    import types

    from mcmc_jl_tpu.samplers.integrators import get_integrator

    X, Y = _data()
    C, d = 8, X.shape[1]
    rng = np.random.default_rng(3)
    theta = jnp.asarray(rng.standard_normal((C, d)) * 0.1, jnp.float32)
    m = jnp.asarray(rng.standard_normal((C, d)), jnp.float32)

    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def evalallg(th):  # batched over chains, matching the kernel layout
        logits = th @ Xj.T
        p = jax.nn.sigmoid(logits)
        g = (Yj - p) @ Xj - th
        lp = (logits @ Yj - jnp.sum(jax.nn.softplus(logits), axis=1)
              - 0.5 * jnp.sum(th * th, axis=1))
        return lp, g

    mod = types.SimpleNamespace(evalallg=evalallg)
    step_fn, _ = get_integrator(integ)
    lp, g = evalallg(theta)
    tg, mg = theta, m
    eps, n_leaps = jnp.float32(0.1), 5
    for _ in range(n_leaps):
        tg, lp, g, mg = step_fn(mod, tg, mg, g, eps)

    XT, Y2, d_pad = pad_design(X, Y)
    _, g0 = evalallg(theta)
    tk, mk, gk, lpk = glm_hmc_leapfrogs(
        XT, Y2, pad_chains(theta, d_pad), pad_chains(m, d_pad),
        pad_chains(g0, d_pad), eps, n_leaps=n_leaps, block_chains=8,
        interpret=True, integrator=integ,
    )
    np.testing.assert_allclose(np.asarray(tk[:, :d]), np.asarray(tg),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mk[:, :d]), np.asarray(mg),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lpk), np.asarray(lp),
                               rtol=2e-5, atol=2e-4)


def test_fused_transition_matches_composed_step():
    """glm_hmc_step (refresh+trajectory+accept in ONE kernel) must agree
    with composing glm_hmc_leapfrogs + the XLA accept logic on the same
    noise/uniform inputs."""
    from mcmc_jl_tpu.ops.pallas_glm import glm_hmc_step

    X, Y = _data(n=72, d=5, seed=9)
    C, d = 16, X.shape[1]
    rng = np.random.default_rng(2)
    XT, Y2, d_pad = pad_design(X, Y)
    live = (np.arange(d_pad) < d).astype(np.float32)[None, :]

    theta = pad_chains(jnp.asarray(rng.standard_normal((C, d)) * 0.2,
                                   jnp.float32), d_pad)
    m0 = jnp.asarray(live * rng.standard_normal((C, d_pad)), jnp.float32)
    logu = jnp.asarray(np.log(rng.random((C, 1))), jnp.float32)

    # start grad/lp from the kernel itself (eps=0 trajectory)
    _, _, g, lp_l = glm_hmc_leapfrogs(XT, Y2, theta, m0, jnp.zeros_like(theta),
                                      0.0, n_leaps=1, block_chains=C,
                                      interpret=True)
    lp = lp_l[:, None]

    th_f, g_f, lp_f, acc_f = glm_hmc_step(
        XT, Y2, theta, g, lp, m0, logu, 0.42, n_leaps=4, block_chains=C,
        interpret=True)

    # composed: trajectory kernel + accept in XLA
    p_th, p_m, p_g, p_lp = glm_hmc_leapfrogs(
        XT, Y2, theta, m0, g, 0.42, n_leaps=4, block_chains=C, interpret=True)
    H0 = -lp[:, 0] + 0.5 * jnp.sum(m0 * m0, axis=1)
    H = -p_lp + 0.5 * jnp.sum(p_m * p_m, axis=1)
    ratio = H0 - H
    acc = np.asarray(jnp.where(jnp.isnan(ratio), False,
                               (ratio > 0) | (ratio > logu[:, 0])))
    assert acc.any() and not acc.all(), "want a mix of accepts and rejects"
    np.testing.assert_array_equal(np.asarray(acc_f[:, 0]) > 0.5, acc)
    a = acc[:, None]
    np.testing.assert_allclose(np.asarray(th_f),
                               np.where(a, np.asarray(p_th), np.asarray(theta)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lp_f[:, 0]),
                               np.where(acc, np.asarray(p_lp), np.asarray(lp[:, 0])),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_f),
                               np.where(a, np.asarray(p_g), np.asarray(g)),
                               rtol=1e-6, atol=1e-6)


def test_sharded_glm_hmc_matches_per_device_runs():
    """shard_map'd fused path == per-device unsharded runs, bitwise.

    Each mesh device runs chains [i*c:(i+1)*c] with key fold_in(k_run, i);
    reproducing that loop on one device must give identical samples (chains
    are independent — no collectives in the hot loop)."""
    from jax.sharding import Mesh

    from mcmc_jl_tpu.ops.glm_hmc import _run, run_glm_hmc_sharded

    X, Y = _data(n=48, d=4, seed=5)
    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("chains",))
    C, steps = 16, 30
    key = jax.random.PRNGKey(7)
    theta, infos = run_glm_hmc_sharded(
        X, Y, n_chains=C, steps=steps, mesh=mesh, n_leaps=3, eps=0.1,
        key=key, interpret=True)
    assert theta.shape == (C, 4)
    assert infos["plogtarget"].shape == (steps, C)

    # reference: per-device loop on a single device
    XT, Y2, d_pad = pad_design(X, Y)
    k_init, k_run = jax.random.split(key)
    inits = 0.1 * jax.random.normal(k_init, (C, 4), dtype=jnp.float32)
    th0 = pad_chains(inits, d_pad)
    c = C // n_dev
    for i in range(n_dev):
        ki = jax.random.fold_in(k_run, i)
        (th_i, _, _), infos_i = _run(
            XT, Y2, th0[i * c:(i + 1) * c], jnp.float32(0.1), ki, d=4,
            steps=steps, n_leaps=3, block_chains=c, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(theta[i * c:(i + 1) * c]),
            np.asarray(th_i[:, :4]))
        np.testing.assert_array_equal(
            np.asarray(infos["plogtarget"][:, i * c:(i + 1) * c]),
            np.asarray(infos_i["plogtarget"]))


def test_fused_glm_wide_parameter_dim():
    """d > LANE (d_pad = 2 tiles): kernel lp/grad still match autodiff."""
    rng = np.random.default_rng(11)
    n, d = 120, 150
    X = (np.column_stack([np.ones(n), rng.standard_normal((n, d - 1))])
         .astype(np.float32) / np.sqrt(d))
    Y = (rng.random(n) < 0.5).astype(np.float32)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def logp(th):
        z = Xj @ th
        return (jnp.dot(Yj, z) - jnp.sum(jnp.logaddexp(0.0, z))
                - 0.5 * th @ th)

    theta = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1)
    lp, g_auto = jax.value_and_grad(logp)(theta)

    XT, Y2, d_pad = pad_design(X, Y)
    assert d_pad == 256
    th_p = pad_chains(theta[None, :], d_pad)
    th1, m1, g1, lp1 = glm_hmc_leapfrogs(
        XT, Y2, th_p, jnp.zeros_like(th_p), jnp.zeros_like(th_p), 0.0,
        n_leaps=1, block_chains=1, interpret=True)
    np.testing.assert_allclose(float(lp1[0]), float(lp), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[0, :d]), np.asarray(g_auto),
                               rtol=2e-4, atol=2e-4)
    assert np.all(np.asarray(g1[0, d:]) == 0)
