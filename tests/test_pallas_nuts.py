"""Fused exact-NUTS kernel (ops/pallas_nuts.py) vs the generic engine.

The kernel must be the SAME sampler (exact No-U-Turn: slice/multinomial
leaf selection, popcount checkpoint stacks, span + overall u-turn rules,
divergence gate) at fused-kernel cost — gated here statistically on a
logistic posterior in interpret mode on the CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mcmc_jl_tpu as mc
from mcmc_jl_tpu.ops.pallas_glm import pad_chains, pad_design
from mcmc_jl_tpu.ops.pallas_nuts import _nuts_run
from mcmc_jl_tpu.parallel.pchains import run_chains


def _data(n=80, d=3, seed=7):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(n), rng.standard_normal((n, d - 1))])
    beta = rng.standard_normal(d) * 0.7
    Y = (rng.random(n) < 1.0 / (1.0 + np.exp(-X @ beta))).astype(np.float64)
    return X, Y


@pytest.mark.parametrize("multinomial", [False, True],
                         ids=["slice", "multinomial"])
def test_fused_nuts_matches_generic(multinomial):
    X, Y = _data()
    d = X.shape[1]
    C, steps, burn = 8, 700, 200
    XT, Y2, d_pad = pad_design(X, Y)
    theta0 = pad_chains(0.1 * jax.random.normal(
        jax.random.PRNGKey(3), (C, d), dtype=jnp.float32), d_pad)

    (thetaF, lpF, gF), infos = _nuts_run(
        XT, Y2, theta0, jnp.float32(0.15), jax.random.PRNGKey(5), d=d,
        steps=steps, maxdoublings=6, block_chains=C, interpret=True,
        kind="logistic", multinomial=multinomial)
    x = np.asarray(infos["ppars"])[burn:]            # (kept, C, d)
    assert np.all(np.isfinite(x))

    # diagnostics protocol
    nd = np.asarray(infos["ndoublings"])
    assert nd.min() >= 1 and nd.max() <= 6
    assert np.asarray(infos["accept"])[burn:].mean() > 0.5
    assert not np.any(np.asarray(infos["diverging"])[burn:])

    # the kernel's trajectory-end log-density must be the exact posterior
    # log-density of the emitted sample
    m = mc.model(glm=("logistic", X, Y))
    rows = x[-3, :2]
    lp_true = np.array([float(m.eval(jnp.asarray(r, jnp.float64)))
                        for r in rows])
    np.testing.assert_allclose(np.asarray(infos["plogtarget"])[-3, :2],
                               lp_true, rtol=1e-4, atol=5e-3)

    # statistical gate vs the generic exact-NUTS engine at the same eps
    s = mc.NUTS(maxdoublings=6, multinomial=multinomial)
    infos_g, _, _ = run_chains(m, s, mc.SerialMC(steps=steps, burnin=burn),
                               C, seed=0, jitter=0.1)
    xg = np.asarray(infos_g["ppars"])[burn:]
    mu_f, mu_g = x.reshape(-1, d).mean(0), xg.reshape(-1, d).mean(0)
    sd = xg.reshape(-1, d).std(0)
    n_eff = 200.0  # conservative pooled-ESS floor for the gate
    z = np.abs(mu_f - mu_g) / (sd * np.sqrt(2.0 / n_eff))
    assert np.all(z < 5), (mu_f, mu_g, z)
    np.testing.assert_allclose(x.reshape(-1, d).std(0), sd, rtol=0.3)


def test_fused_nuts_deepens_on_hard_target():
    """On a narrow-step configuration the tree must actually double
    several times (the bookkeeping, not just single-leaf trees)."""
    X, Y = _data()
    d = X.shape[1]
    XT, Y2, d_pad = pad_design(X, Y)
    theta0 = pad_chains(jnp.zeros((4, d), jnp.float32), d_pad)
    _, infos = _nuts_run(
        XT, Y2, theta0, jnp.float32(0.02), jax.random.PRNGKey(1), d=d,
        steps=60, maxdoublings=8, block_chains=4, interpret=True,
        kind="logistic")
    nd = np.asarray(infos["ndoublings"])
    assert nd.max() >= 4, nd.max()
