"""Adaptive HMC at fused-kernel speed: the warm-start pipeline.

The realistic production run — dual-averaging / tuner step-size adaptation
plus a diagonal mass metric during burn-in, then a long sampling phase —
historically fell off every fast path (adaptation needs per-chain mutable
state).  Here the whole thing goes through ``run(task, chains=N)``:
burn-in runs on the generic engine with the sampler's own adaptation, the
frozen hyper-parameters drive the fused Pallas kernel for the sampling
phase (ops/warmstart.py), and the chains come back with the standard
protocol (exact resume included).

On a TPU v5e this measures ~154M leapfrog/s END TO END (warmup included)
with ~70x the ESS/s of the same budget spent at fixed hyper-parameters
(docs/BENCH.md).  On CPU the fused kernel runs in interpret mode — same
code path, test-sized shapes.
"""
import numpy as np

import mcmc_jl_tpu as mc


def make_data(n=1000, nbeta=10, seed=1):
    rng = np.random.default_rng(seed)
    X = np.column_stack([np.ones(n), rng.standard_normal((n, nbeta - 1))])
    beta0 = rng.standard_normal(nbeta)
    Y = (rng.random(n) < 1.0 / (1.0 + np.exp(-X @ beta0))).astype(np.float64)
    return X, Y, beta0


def main(n=1000, nbeta=10, chains=8, steps=2000, burnin=500):
    X, Y, beta0 = make_data(n, nbeta)
    model = mc.model(glm=("logistic", X, Y))

    # EmpMCTuner adapts the step size toward 80% acceptance during burn-in
    # (reference samplers.jl:31-50); mass_adapt="diag" adds a Welford
    # diagonal metric (beyond-reference).  Both freeze at the end of
    # burn-in — which is exactly what lets the sampling phase run fused.
    sampler = mc.HMC(10, 0.02, mc.EmpMCTuner(0.8, adapt_step=50),
                     mass_adapt="diag")
    task = model * sampler * mc.SerialMC(steps=steps, burnin=burnin)

    chains_out = mc.run(task, chains=chains, seed=0)
    acc = np.mean([mc.acceptance(c) for c in chains_out])
    ess = np.mean([np.mean(mc.ess(c)) for c in chains_out])
    print(f"acceptance {acc:.1f}%  mean ESS {ess:.0f} per chain")

    pooled = np.mean([c.samples.values.mean(0) for c in chains_out], axis=0)
    print("posterior mean (first 4):", np.round(pooled[:4], 3))
    print("truth          (first 4):", np.round(beta0[:4], 3))

    # exact resume at the frozen hyper-parameters
    more = mc.resume(chains_out[0], steps=200)
    print("resumed rows:", more.samples.shape[0])
    return chains_out


if __name__ == "__main__":
    main()
