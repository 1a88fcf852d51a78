"""Diagonal mass-matrix warmup for HMC (mass_adapt=True) — a capability the
reference lacks (its only preconditioning is the static model.scale hint).

On a badly-scaled Gaussian (marginal sds 10, 1, 0.1), fixed-metric HMC with
a step small enough to accept is crippled on the wide coordinate; the
Welford-preconditioned version must sample all coordinates correctly and
dramatically improve the worst-coordinate ESS."""
import jax.numpy as jnp
import numpy as np

import mcmc_jl_tpu as mc

SDS = np.array([10.0, 1.0, 0.1])


def _model():
    prec = jnp.asarray(1.0 / SDS**2)
    return mc.model(lambda v: -0.5 * jnp.sum(prec * v * v), gradient=True,
                    init=jnp.asarray([1.0, 1.0, 0.1]), check_init=False)


def test_mass_adapt_posterior_and_ess_gain():
    m = _model()
    steps, burnin = 6000, 2000
    c_plain = mc.run(m * mc.HMC(10, 0.08) * mc.SerialMC(steps=steps, burnin=burnin),
                     seed=0)
    c_mass = mc.run(m * mc.HMC(10, 0.8, mass_adapt=True)
                    * mc.SerialMC(steps=steps, burnin=burnin), seed=0)

    x = c_mass.samples.values
    # correct marginals on every scale
    np.testing.assert_allclose(x.std(axis=0, ddof=1), SDS, rtol=0.25)
    z = np.abs(x.mean(axis=0)) / np.maximum(np.sqrt(mc.var(c_mass)), 1e-12)
    assert np.all(z < 5), z

    ess_plain = mc.ess(c_plain)
    ess_mass = mc.ess(c_mass)
    # the wide coordinate (index 0) is where fixed-metric HMC suffers
    assert ess_mass[0] > 3 * ess_plain[0], (ess_plain, ess_mass)
    assert mc.acceptance(c_mass) > 50


def test_mass_adapt_freezes_after_burnin():
    m = _model()
    c = mc.run(m * mc.HMC(10, 0.5, mass_adapt=True)
               * mc.SerialMC(steps=1500, burnin=500), seed=1)
    st = c.task.state
    assert int(st.w_count) == 500  # Welford stops at burnin
    # and resume keeps using the frozen metric exactly
    c2 = mc.resume(c, steps=300)
    assert int(c2.task.state.w_count) == 500
    assert np.all(np.isfinite(c2.samples.values))


def test_mass_adapt_off_keeps_identity_metric():
    m = _model()
    c = mc.run(m * mc.HMC(10, 0.08) * mc.SerialMC(steps=500, burnin=200), seed=2)
    assert int(c.task.state.w_count) == 0


def test_nuts_mass_adapt():
    m = _model()
    c_plain = mc.run(m * mc.NUTS() * mc.SerialMC(steps=3000, burnin=1500), seed=0)
    c_mass = mc.run(m * mc.NUTS(mass_adapt=True)
                    * mc.SerialMC(steps=3000, burnin=1500), seed=0)
    x = c_mass.samples.values
    np.testing.assert_allclose(x.std(axis=0, ddof=1), SDS, rtol=0.3)
    # min-coordinate ESS improves (DA alone must shrink eps for the 0.1-sd
    # coordinate, crippling the 10-sd coordinate)
    assert min(mc.ess(c_mass)) > 1.5 * min(mc.ess(c_plain)), (
        mc.ess(c_plain), mc.ess(c_mass))
    assert int(c_mass.task.state.w_count) == 1500
