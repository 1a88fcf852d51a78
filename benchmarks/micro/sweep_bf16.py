"""Sweep mxu_dtype x chains for the fused GLM HMC kernel on TPU."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mcmc_jl_tpu.ops.glm_hmc import _run
from mcmc_jl_tpu.ops.pallas_glm import pad_chains, pad_design

rng = np.random.default_rng(1)
n, nbeta = 1000, 10
Xh = np.column_stack([np.ones(n), rng.standard_normal((n, nbeta - 1))])
beta0 = rng.standard_normal(nbeta)
Yh = (rng.random(n) < 1.0 / (1.0 + np.exp(-Xh @ beta0))).astype(np.float64)
XT, Y2, d_pad = pad_design(Xh, Yh)

import os
steps, n_leaps = int(os.environ.get('STEPS', 2000)), int(os.environ.get('NLEAPS', 10))


def bench(C, blk, mxu, kind="logistic"):
    @partial(jax.jit, static_argnames=())
    def go(key):
        k_init, k_run = jax.random.split(key)
        th0 = pad_chains(0.1 * jax.random.normal(k_init, (C, nbeta), dtype=jnp.float32), d_pad)
        (theta, _, _), infos = _run(XT, Y2, th0, jnp.float32(0.05), k_run,
                                    d=nbeta, steps=steps, n_leaps=n_leaps,
                                    block_chains=blk, interpret=False,
                                    mxu_dtype=mxu, kind=kind)
        return (jnp.mean(theta, axis=0), jnp.mean(infos["accept"]),
                jnp.mean(infos["plogtarget"][-1]))

    out = go(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        out = go(jax.random.PRNGKey(rep + 1))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    rate = C * steps * n_leaps / dt
    print(f"C={C:6d} blk={blk:5d} mxu={mxu.__name__:9s} kind={kind:8s} "
          f"rate={rate/1e6:7.1f}M/s acc={float(out[1]):.3f} "
          f"lp={float(out[2]):.1f}", flush=True)
    return rate


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "f32"):
        bench(16384, 1024, jnp.float32)
    if which == "linear":
        bench(16384, 1024, jnp.float32, kind="linear")
        bench(16384, 2048, jnp.float32, kind="linear")
    if which == "blocks":
        # re-sweep block sizes: the round-1 sweep ran at the default 16 MiB
        # scoped-VMEM budget; the kernel now requests 100 MiB
        for C in (16384, 32768):
            for blk in (512, 1024, 2048, 4096):
                try:
                    bench(C, blk, jnp.float32)
                except Exception as e:
                    print(f"C={C} blk={blk} FAILED {type(e).__name__}",
                          flush=True)
    if which == "bf16":
        for blk in (1024, 2048):
            bench(16384, blk, jnp.bfloat16)
    if which == "diag":
        # linear link = no transcendental in the hot loop; the gap to
        # logistic bounds the VPU sigmoid cost per leapfrog
        bench(16384, 1024, jnp.float32, kind="linear")
        bench(16384, 1024, jnp.float32)
