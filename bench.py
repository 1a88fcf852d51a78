"""Headline benchmark: effective HMC leapfrog steps/s/chip on the Bayesian
logistic-regression example (the reference's benchmark workload:
benchmarks/benchunits/binomial.jl, 10 params x 1000 obs).

Baseline (BASELINE.md): the reference evaluates loglik+gradient in 0.748 ms
=> ~1337 leapfrog steps/s on 2013-era CPU.  The TPU build's north star is
>=1e6 leapfrog/s/chip.

On TPU this runs the Pallas fused-trajectory kernel
(mcmc_jl_tpu/ops/pallas_glm.py): 8192 chains, whole 10-leapfrog trajectories
in VMEM, matmuls on the MXU, diagnostics reduced on device.  Off-TPU it
falls back to the generic vmapped lax.scan path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time
from functools import partial

import numpy as np

REFERENCE_LEAPFROG_RATE = 1.0 / 0.748e-3  # ≈1337/s (BASELINE.md, binomial.jl:24)


def _data(n=1000, nbeta=10, dtype=None):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    Xh = np.column_stack([np.ones(n), rng.standard_normal((n, nbeta - 1))])
    beta0 = rng.standard_normal(nbeta)
    Yh = (rng.random(n) < 1.0 / (1.0 + np.exp(-Xh @ beta0))).astype(np.float64)
    return Xh, Yh


def _bench_tpu(X, Y, multistep=True):
    """Fused Pallas path; on-device output reduction (samples/diagnostics
    stay on chip; only summary scalars cross the tunnel).

    ``multistep=True`` (default) runs the multi-transition in-kernel-PRNG
    kernel (glm_hmc.run_glm_hmc_multistep's inner path): 50 full HMC
    transitions per launch, momentum refresh + Metropolis accept on the
    hardware PRNG, nothing but state crossing HBM between launches —
    measured 189.3M vs 177.8M leapfrog/s for the composed path on v5e
    (fetch-timed; 5 reps within ±0.3%).
    A lowering failure falls back to the composed trajectory-kernel path
    (and main() falls back further to the generic engine)."""
    import jax
    import jax.numpy as jnp

    from mcmc_jl_tpu.ops.glm_hmc import _run, _run_multistep
    from mcmc_jl_tpu.ops.pallas_glm import pad_chains, pad_design

    nbeta = X.shape[1]
    XT, Y2, d_pad = pad_design(X, Y)
    # 16384 chains x 1024-chain blocks measured fastest with VMEM headroom
    # (sweep: 8192/1024 172.5M, 16384/1024 175.5M, 24576/1024 175.9M but
    # near the 16M scoped-vmem limit, 16384/2048 + 32768/1024 OOM;
    # multistep k_trans 25 and 50 time identically at blk=1024)
    C, steps, n_leaps, blk = 16384, 2000, 10, 1024
    # k_trans sweep on v5e (round 3): 50 -> 189.9M, 200 -> 192.8M
    # leapfrog/s (2048-chain blocks no better); 10 launches of 200
    # in-kernel transitions amortize the remaining per-launch overhead
    k_trans = 200

    @partial(jax.jit, static_argnames=("ms",))
    def go(key, ms=False):
        k_init, k_run = jax.random.split(key)
        th0 = pad_chains(
            0.1 * jax.random.normal(k_init, (C, nbeta), dtype=jnp.float32), d_pad
        )
        if ms:
            theta, infos = _run_multistep(
                XT, Y2, th0, jnp.float32(0.05), k_run, d=nbeta,
                n_launches=steps // k_trans, k_trans=k_trans,
                n_leaps=n_leaps, block_chains=blk)
            acc = jnp.mean(infos["accept_rate"])
        else:
            (theta, _, _), infos = _run(XT, Y2, th0, jnp.float32(0.05), k_run,
                                        d=nbeta, steps=steps, n_leaps=n_leaps,
                                        block_chains=blk, interpret=False)
            acc = jnp.mean(infos["accept"])
        return (jnp.mean(theta, axis=0), acc,
                jnp.mean(infos["plogtarget"][-1]))

    def fetch(out):
        # device->host transfer INSIDE the timer: on the tunneled axon
        # platform block_until_ready does not reliably block (measured:
        # 1.7s executions "completing" in 3 ms), so the only trustworthy
        # stop-clock is fetching the reduced scalars themselves.
        return np.asarray(out[0]), float(out[1]), float(out[2])

    ms = bool(multistep)
    warmed = False
    if ms:
        try:
            # fetch() inside the probe: a RUNTIME kernel failure must be
            # caught here, not escape into the timing loop — and a
            # successful probe doubles as the warmup run.
            fetch(go(jax.random.PRNGKey(0), ms=True))
            warmed = True
        except Exception as e:  # pragma: no cover - backend-specific
            import sys

            print(f"multistep kernel unavailable ({type(e).__name__}); "
                  f"using the composed trajectory kernel", file=sys.stderr)
            ms = False
    go = partial(go, ms=ms)

    if not warmed:
        fetch(go(jax.random.PRNGKey(0)))
    ts, acc, lp = [], 0.0, 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        _, acc, lp = fetch(go(jax.random.PRNGKey(rep + 1)))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    assert np.isfinite(lp), "non-finite log-target in bench run"
    assert acc > 0.05, f"acceptance collapsed: {acc}"
    return C * steps * n_leaps / dt


def _bench_generic(X, Y):
    import jax
    import jax.numpy as jnp

    import mcmc_jl_tpu as mc
    from mcmc_jl_tpu.parallel import run_chains

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    Xd = jnp.asarray(X, dtype=dtype)
    Yd = jnp.asarray(Y, dtype=dtype)
    nbeta = X.shape[1]

    def logp(theta):
        logits = Xd @ theta
        return (jnp.dot(Yd, logits) - jnp.sum(jnp.logaddexp(0.0, logits))
                - 0.5 * jnp.dot(theta, theta))

    model = mc.model(logp, gradient=True, init=jnp.zeros(nbeta, dtype=dtype),
                     check_init=False)
    n_leaps, n_chains, steps = 10, 64, 50
    runner = mc.SerialMC(steps=steps)
    sampler = mc.HMC(n_leaps, 0.05)
    infos, _, _ = run_chains(model, sampler, runner, n_chains, seed=0, jitter=0.1)
    jax.block_until_ready(infos["plogtarget"])
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        infos, _, _ = run_chains(model, sampler, runner, n_chains, seed=rep + 1,
                                 jitter=0.1)
        jax.block_until_ready(infos["plogtarget"])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    acc = float(np.mean(np.asarray(infos["accept"])))
    assert acc > 0.05, f"acceptance collapsed: {acc}"
    return n_chains * steps * n_leaps / dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    X, Y = _data()
    if on_tpu:
        try:
            rate = _bench_tpu(X, Y)
        except Exception as e:  # pragma: no cover - driver safety net
            import sys

            print(f"pallas path failed ({type(e).__name__}); falling back "
                  f"to generic path", file=sys.stderr)
            rate = _bench_generic(X, Y)
    else:
        rate = _bench_generic(X, Y)

    print(json.dumps({
        "metric": "hmc_leapfrog_steps_per_sec_per_chip_logistic_1000x10",
        "value": round(rate, 1),
        "unit": "leapfrog/s",
        "vs_baseline": round(rate / REFERENCE_LEAPFROG_RATE, 1),
    }))


if __name__ == "__main__":
    main()
