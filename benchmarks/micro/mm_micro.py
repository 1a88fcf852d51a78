"""Microbench: fused-loop matmul pair f32 vs bf16 at kernel shapes."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

BLK, D, N, ITERS = 1024, 128, 1000, 100


def kern(xt_ref, th_ref, out_ref, *, dt):
    xt = xt_ref[:].astype(dt)
    xtt = xt_ref[:].T.astype(dt)
    th0 = th_ref[:]

    def body(_, th):
        z = jnp.dot(th.astype(dt), xt, preferred_element_type=jnp.float32)
        r = z * (1.0 - z * 0.001)  # stand-in elementwise (no transcendental)
        g = jnp.dot(r.astype(dt), xtt, preferred_element_type=jnp.float32)
        return th + 1e-6 * g

    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, th0)


@partial(jax.jit, static_argnames=("dt",))
def run(xt, th, dt):
    return pl.pallas_call(
        partial(kern, dt=dt),
        in_specs=[pl.BlockSpec((D, N), lambda: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((BLK, D), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK, D), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BLK, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(xt, th)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((D, N)), jnp.float32)
    th = jnp.asarray(0.01 * rng.standard_normal((BLK, D)), jnp.float32)
    for dt in (jnp.float32, jnp.bfloat16):
        out = run(xt, th, dt); jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(run(xt, th, dt))
            ts.append(time.perf_counter() - t0)
        t = np.median(ts)
        fl = 2 * 2 * BLK * D * N * ITERS
        print(f"{dt.__name__:9s}: {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TFLOP/s")
