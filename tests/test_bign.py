"""N-tiled GLM kernel (ops/pallas_glm_bign.py): large-dataset fused path.

Correctness gates in interpret mode: the tiled (logp, grad) must equal the
direct computation exactly (incl. zero-weight observation padding, offsets,
vector prior), and the tiled HMC driver must match the whole-trajectory
kernel chains statistically."""
import jax
import jax.numpy as jnp
import numpy as np

import mcmc_jl_tpu as mc
from mcmc_jl_tpu.ops.pallas_glm_bign import (glm_logp_grad_tiled,
                                             pad_design_tiled,
                                             run_glm_hmc_bign)


def _data(n, d, seed=3):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(n), rng.standard_normal((n, d - 1))])
    beta = rng.standard_normal(d) * 0.7
    Y = (rng.random(n) < 1.0 / (1.0 + np.exp(-X @ beta))).astype(np.float64)
    return X, Y


def _direct(X, Y, theta, w=None, o=None, lam=1.0):
    z = X @ theta.T
    if o is not None:
        z = z + o[:, None]
    ll = z * Y[:, None] - np.logaddexp(0.0, z)
    if w is not None:
        ll = w[:, None] * ll
    lamv = np.asarray(lam) * np.ones(X.shape[1])
    return ll.sum(0) - 0.5 * (theta * theta * lamv).sum(1)


def test_tiled_grad_matches_direct_with_padding():
    # N=150 padded to two 128-tiles; padded obs must contribute ZERO
    X, Y = _data(150, 5)
    rng = np.random.default_rng(0)
    theta = rng.standard_normal((8, 5)).astype(np.float32) * 0.3
    XT, Y2, W, d_pad, N = pad_design_tiled(X, Y, tile_n=128)
    assert XT.shape[1] == 256 and W is not None
    th = jnp.asarray(np.pad(theta, ((0, 0), (0, d_pad - 5))))
    lp, g = glm_logp_grad_tiled(XT, Y2, th, tile_n=128, block_chains=8,
                                interpret=True, weights=W, _use_w=True)
    want = _direct(X, Y, theta.astype(np.float64))
    np.testing.assert_allclose(np.asarray(lp), want, rtol=2e-5)

    g_want = jax.vmap(jax.grad(
        lambda t: jnp.sum(jnp.asarray(X) @ t * jnp.asarray(Y)
                          - jnp.logaddexp(0.0, jnp.asarray(X) @ t))
        - 0.5 * t @ t))(jnp.asarray(theta, jnp.float64))
    np.testing.assert_allclose(np.asarray(g)[:, :5], np.asarray(g_want),
                               rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(g)[:, 5:] == 0.0)


def test_tiled_grad_offsets_weights_vecprior():
    X, Y = _data(100, 4)
    rng = np.random.default_rng(1)
    w = rng.uniform(0.5, 2.0, 100)
    o = 0.3 * rng.standard_normal(100)
    lamv = np.array([1.0, 2.0, 0.5, 3.0])
    theta = rng.standard_normal((4, 4)).astype(np.float32) * 0.3
    XT, Y2, W, d_pad, N = pad_design_tiled(X, Y, weights=w, tile_n=64)
    O = np.zeros((1, XT.shape[1]), np.float32)
    O[0, :100] = o
    lam_pad = np.concatenate([lamv, np.ones(d_pad - 4)]).astype(np.float32)
    th = jnp.asarray(np.pad(theta, ((0, 0), (0, d_pad - 4))))
    lp, g = glm_logp_grad_tiled(
        XT, Y2, th, tile_n=64, block_chains=4, interpret=True,
        weights=W, offsets=jnp.asarray(O), prior_prec=lam_pad.reshape(1, -1),
        _use_w=True, _use_o=True, _unit_prior=False, _vec_prior=True)
    want = _direct(X, Y, theta.astype(np.float64), w=w, o=o, lam=lamv)
    np.testing.assert_allclose(np.asarray(lp), want, rtol=2e-5)


def test_bign_hmc_matches_small_kernel():
    """Tiled driver chains match the whole-trajectory kernel statistically
    on the same posterior (moderate N so both paths run)."""
    from mcmc_jl_tpu.ops.glm_hmc import run_glm_hmc

    X, Y = _data(200, 4)
    kw = dict(n_chains=16, steps=500, n_leaps=5, eps=0.1, seed=0,
              interpret=True)
    th_a, infos_a = run_glm_hmc_bign(X, Y, tile_n=64, **kw)
    th_b, infos_b = run_glm_hmc(X, Y, **kw)
    # same posterior: pooled sample moments agree within MC error
    a = np.asarray(th_a)
    b = np.asarray(th_b)
    se = b.std(0) / np.sqrt(b.shape[0]) + a.std(0) / np.sqrt(a.shape[0])
    assert np.all(np.abs(a.mean(0) - b.mean(0)) < 6 * se + 0.1), (
        a.mean(0), b.mean(0))
    acc = float(np.mean(np.asarray(infos_a["accept"])))
    assert acc > 0.5, acc
    # logtarget diagnostic is the exact model log-density
    m = mc.model(glm=("logistic", X, Y))
    lp_true = _direct(X, Y, a.astype(np.float64))
    np.testing.assert_allclose(np.asarray(infos_a["plogtarget"][-1]),
                               lp_true, rtol=1e-4, atol=5e-3)


def test_bign_routing_through_run(monkeypatch):
    """N above the threshold routes run(chains=, fused=True) through the
    tiled driver (threshold lowered so the test stays interpret-sized)."""
    import mcmc_jl_tpu.ops.pallas_glm_bign as bn

    monkeypatch.setattr(bn, "BIGN_THRESHOLD", 100)
    X, Y = _data(150, 4)
    m = mc.model(glm=("logistic", X, Y))
    task = m * mc.HMC(5, 0.1) * mc.SerialMC(steps=300, burnin=100)
    chains = mc.run(task, chains=4, seed=0, fused=True)
    c0 = chains[0]
    assert c0.samples.shape == (len(task.runner.r), 4)
    assert mc.acceptance(c0) > 40
    c1 = mc.resume(c0, steps=50)
    assert np.all(np.isfinite(c1.samples.values))


def test_bign_collect_protocol():
    X, Y = _data(130, 3)
    th, infos = run_glm_hmc_bign(X, Y, n_chains=4, steps=50, n_leaps=3,
                                 eps=0.1, seed=0, interpret=True,
                                 tile_n=64, collect=True)
    assert infos["ppars"].shape == (50, 4, 3)
    assert infos["pgrads"].shape == (50, 4, 3)
    assert np.all(np.isfinite(np.asarray(infos["ppars"])))


def test_bign_sharded_data_axis_matches_single():
    """(chains, data) 2-D mesh (VERDICT r4 missing #4): per-shard tiled
    kernels + one fused psum per gradient must reproduce the 1x1-mesh run
    (identical PRNG path; only the psum reduction order differs)."""
    from jax.sharding import Mesh
    from mcmc_jl_tpu.ops.pallas_glm_bign import run_glm_hmc_bign_sharded

    X, Y = _data(600, 5)
    devs = np.array(jax.devices())
    assert devs.size >= 8, "suite requires the 8-device CPU mesh"
    mesh24 = Mesh(devs[:8].reshape(2, 4), ("chains", "data"))
    mesh11 = Mesh(devs[:1].reshape(1, 1), ("chains", "data"))
    kw = dict(n_chains=8, steps=40, n_leaps=3, eps=0.05, seed=0,
              tile_n=128, interpret=True, collect=True)
    th_s, infos_s = run_glm_hmc_bign_sharded(X, Y, mesh=mesh24, **kw)
    th_1, infos_1 = run_glm_hmc_bign_sharded(X, Y, mesh=mesh11, **kw)
    np.testing.assert_allclose(np.asarray(th_s), np.asarray(th_1),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(infos_s["plogtarget"]),
                               np.asarray(infos_1["plogtarget"]),
                               rtol=2e-4)
    # and both match the exact posterior log-density of the final samples
    lp_true = _direct(X, Y, np.asarray(th_s, np.float64))
    np.testing.assert_allclose(np.asarray(infos_s["plogtarget"][-1]),
                               lp_true, rtol=1e-4)


def test_bign_sharded_weights_offsets():
    from jax.sharding import Mesh
    from mcmc_jl_tpu.ops.pallas_glm_bign import run_glm_hmc_bign_sharded

    X, Y = _data(500, 4)
    rng = np.random.default_rng(2)
    w = rng.uniform(0.5, 1.5, 500)
    o = 0.1 * rng.standard_normal(500)
    devs = np.array(jax.devices())
    mesh = Mesh(devs[:8].reshape(2, 4), ("chains", "data"))
    th, infos = run_glm_hmc_bign_sharded(
        X, Y, n_chains=8, steps=30, n_leaps=3, eps=0.05, seed=1,
        mesh=mesh, tile_n=128, interpret=True, weights=w, offsets=o,
        collect=True)
    lp_true = _direct(X, Y, np.asarray(th, np.float64), w=w, o=o)
    np.testing.assert_allclose(np.asarray(infos["plogtarget"][-1]),
                               lp_true, rtol=1e-4)
