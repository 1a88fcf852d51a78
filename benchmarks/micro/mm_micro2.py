"""Micro v2: incrementally morph toward the real GLM kernel to find the cliff.
Variants: A = base matmul pair; B = + leapfrog carries (theta,m,g) + y-resid;
C = B + grid over 16 blocks (16384 chains); D = C + logp at end."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import time
from functools import partial
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import os
D, N, ITERS = 128, 1000, int(os.environ.get('ITERS', 100))


def kern_b(xt_ref, y_ref, th_ref, m_ref, g_ref, out_ref, *, dt):
    xt = xt_ref[:].astype(dt)
    xtt = xt_ref[:].T.astype(dt)
    y = y_ref[:]
    eps = jnp.float32(0.01)

    def grad(th):
        z = jnp.dot(th.astype(dt), xt, preferred_element_type=jnp.float32)
        r = y - z
        return jnp.dot(r.astype(dt), xtt, preferred_element_type=jnp.float32) - th

    def body(_, c):
        th, m, g = c
        m = m + 0.5 * eps * g
        th = th + eps * m
        g = grad(th)
        m = m + 0.5 * eps * g
        return th, m, g

    th, m, g = jax.lax.fori_loop(0, ITERS, body, (th_ref[:], m_ref[:], g_ref[:]))
    out_ref[:] = th + m + g


@partial(jax.jit, static_argnames=("dt", "blk", "C"))
def run(xt, y, th, m, g, dt, blk, C):
    grid = (C // blk,)
    cs = pl.BlockSpec((blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(kern_b, dt=dt),
        grid=grid,
        in_specs=[pl.BlockSpec((D, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  cs, cs, cs],
        out_specs=cs,
        out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(xt, y, th, m, g)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((D, N)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, N)), jnp.float32)
    for C, blk in ((1024, 1024), (16384, 1024), (16384, 2048)):
        th = jnp.asarray(0.01 * rng.standard_normal((C, D)), jnp.float32)
        m = jnp.zeros_like(th); g = jnp.zeros_like(th)
        out = run(xt, y, th, m, g, jnp.float32, blk, C); jax.block_until_ready(out)
        ts = []
        for rep in range(5):
            th_r = th + jnp.float32(1e-6 * (rep + 1))   # defeat result memoization
            t0 = time.perf_counter()
            jax.block_until_ready(run(xt, y, th_r, m, g, jnp.float32, blk, C))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        per = t / (ITERS * (C // blk)) * 1e6 * (blk / 1024)
        print(f"C={C:6d} blk={blk:5d}: {t*1e3:8.3f} ms  "
              f"{per:5.2f} us per 1024-chain-leapfrog  "
              f"rate={C*ITERS/t/1e6:7.1f}M leapfrog/s", flush=True)
