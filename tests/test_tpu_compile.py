"""TPU compile smoke tests (run with ``pytest -m tpu``; excluded by default).

Round-1 lesson (ADVICE.md): the fused transition kernel ``glm_hmc_step`` was
validated only in interpret mode, which skips Mosaic lowering entirely — it
then failed to compile on real hardware and the headline bench collapsed to
the generic path.  These tests compile the Pallas kernels on the *real* TPU
backend (AOT ``lower().compile()``, no device buffers needed beyond the
remote-compile tunnel) in a subprocess, because conftest.py pins the suite
interpreter to CPU.

The production safety net is separate: ``ops/glm_hmc.step_kernel_supported``
probe-compiles before routing and falls back to the composed
trajectory-kernel path.
"""
import os
import subprocess
import sys

import pytest

_PROBE = r"""
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if jax.default_backend() != "tpu":
    print("NO_TPU"); raise SystemExit(0)
from mcmc_jl_tpu.ops.glm_hmc import step_kernel_supported
from mcmc_jl_tpu.ops.pallas_glm import glm_hmc_leapfrogs, LANE

# full-transition kernel, default logistic config at bench-like block shape
assert step_kernel_supported(LANE, 1000, 256), "glm_hmc_step failed Mosaic"
# weighted/offset/non-unit-prior specialization (extra VMEM inputs)
assert step_kernel_supported(LANE, 500, 128, kind="probit", use_w=True,
                             use_o=True, unit_prior=False,
                             integrator="2stage"), \
    "specialized glm_hmc_step failed Mosaic"

# trajectory kernel AOT compile
f32 = jax.ShapeDtypeStruct
cd = f32((128, LANE), jnp.float32)
jax.jit(lambda *a: glm_hmc_leapfrogs(*a, n_leaps=2, block_chains=128)).lower(
    f32((LANE, 1000), jnp.float32), f32((1, 1000), jnp.float32),
    cd, cd, cd, f32((), jnp.float32)).compile()

# custom-target kernel: coordwise catalog target (iota mask + double-where
# support masking + in-kernel jax.grad) through the production probe
from mcmc_jl_tpu.ops.pallas_target import coordwise_logp, target_kernel_supported
from mcmc_jl_tpu.models.distributions import Gamma
blockfn = coordwise_logp(lambda x: Gamma(2.0, 1.5).logpdf(x), 4, safe=1.0)
assert target_kernel_supported(blockfn, LANE, 128), \
    "fused custom-target kernel failed Mosaic"
assert target_kernel_supported(blockfn, LANE, 128, integrator="2stage"), \
    "fused custom-target 2stage kernel failed Mosaic"

# wide parameter dimension: d_pad = 2 lane tiles
cw = f32((128, 2 * LANE), jnp.float32)
jax.jit(lambda *a: glm_hmc_leapfrogs(*a, n_leaps=2, block_chains=128)).lower(
    f32((2 * LANE, 500), jnp.float32), f32((1, 500), jnp.float32),
    cw, cw, cw, f32((), jnp.float32)).compile()

# fused RWM kernel, hardware-PRNG mode (prng_seed/prng_random_bits +
# Box-Muller must all lower)
from mcmc_jl_tpu.ops.pallas_rwm import fused_target_rwm_steps
jax.jit(lambda th, sc, seeds: fused_target_rwm_steps(
    blockfn, th, sc, k_steps=3, seeds=seeds, block_chains=128,
    noise="hw")).lower(
    f32((128, LANE), jnp.float32), f32((1, LANE), jnp.float32),
    jax.ShapeDtypeStruct((1,), jnp.int32)).compile()

# round-3 kernel variants: vector prior (warm-start mass fold), dynamic
# trip count (ChEES), and both combined
from mcmc_jl_tpu.ops.glm_hmc import trajectory_kernel_supported
assert trajectory_kernel_supported(LANE, 1000, 256, unit_prior=False,
                                   vec_prior=True), "vec-prior traj kernel"
assert trajectory_kernel_supported(LANE, 1000, 256, dyn_len=True), \
    "dyn-len traj kernel"
assert trajectory_kernel_supported(LANE, 1000, 256, unit_prior=False,
                                   vec_prior=True, dyn_len=True), \
    "vec+dyn traj kernel"

# round-4: full-matrix prior (dense-mass fold lam L^T L)
assert trajectory_kernel_supported(LANE, 1000, 256, unit_prior=False,
                                   mat_prior=True), "mat-prior traj kernel"

# round-4: per-coordinate step-size row (custom-target diag-mass fold),
# dynamic trip count (ChEES/NUTS-handoff on targets), and both combined
assert target_kernel_supported(blockfn, LANE, 128, vec_eps=True), \
    "vec-eps custom-target kernel failed Mosaic"
assert target_kernel_supported(blockfn, LANE, 128, dyn_len=True), \
    "dyn-len custom-target kernel failed Mosaic"
assert target_kernel_supported(blockfn, LANE, 128, vec_eps=True,
                               dyn_len=True), \
    "vec+dyn custom-target kernel failed Mosaic"

# round-4: matrix prior in the N-tiled gradient kernel (dense x big-N)
from mcmc_jl_tpu.ops.pallas_glm_bign import bign_kernel_supported
assert bign_kernel_supported(LANE, 16384, 256, unit_prior=False,
                             use_w=True, mat_prior=True), \
    "mat-prior tiled gradient kernel failed Mosaic"

# round-4: lifted DATA-BEARING target (closure consts as VMEM rows) —
# the reference's Ornstein AR(1) likelihood as the witness workload
import mcmc_jl_tpu as _mc
import numpy as _np
_x = jnp.asarray(_np.linspace(0.0, 1.0, 200))
def _ou(v):
    fac = jnp.exp(-1.0 / v[0])
    resid = _x[1:] - _x[:-1] * fac - v[2] * (1.0 - fac)
    return jnp.sum(-0.5 * (resid / v[1]) ** 2) - jnp.log(v[1]) * 199.0
_m = _mc.model(_ou, gradient=True, init=jnp.asarray([20.0, 0.1, 10.0]),
               check_init=False)
from mcmc_jl_tpu.ops.pallas_target import lifted_model_block
_lb, _consts = lifted_model_block(_m)
assert len(_consts) >= 1, "no data hoisted"
assert target_kernel_supported(_lb, LANE, 128, consts=_consts), \
    "lifted data-bearing target kernel failed Mosaic"

# multi-transition custom-target kernel (in-kernel hardware PRNG),
# data-free AND with a lifted data row (round 4)
from mcmc_jl_tpu.ops.pallas_target import _multistep_inner
jax.jit(lambda th, seeds, eps: _multistep_inner(
    th, seeds, eps, logp_block=blockfn, d=4, n_leaps=3, k_trans=5,
    block_chains=128)).lower(
    f32((128, LANE), jnp.float32), jax.ShapeDtypeStruct((1,), jnp.int32),
    f32((), jnp.float32)).compile()
jax.jit(lambda th, seeds, eps, c: _multistep_inner(
    th, seeds, eps, logp_block=_lb, d=3, n_leaps=3, k_trans=5,
    block_chains=128, consts=(c,))).lower(
    f32((128, LANE), jnp.float32), jax.ShapeDtypeStruct((1,), jnp.int32),
    f32((), jnp.float32), f32((1, 200), jnp.float32)).compile()

# round-5: fused exact-NUTS tree kernel (nested while loops + scratch-ref
# state machine) — slice, multinomial, and folded-metric variants
from mcmc_jl_tpu.ops.pallas_nuts import nuts_kernel_supported
assert nuts_kernel_supported(LANE, 1000, 256, 6), "exact-NUTS kernel"
assert nuts_kernel_supported(LANE, 1000, 256, 6, multinomial=True), \
    "exact-NUTS multinomial kernel"
assert nuts_kernel_supported(LANE, 1000, 256, 6, unit_prior=False,
                             vec_prior=True), "exact-NUTS vec-prior kernel"

# round-5: Halton multistep rows kernel (in-kernel jittered lengths +
# rank-3 per-transition row outputs)
from mcmc_jl_tpu.ops.pallas_glm import multistep_rows_supported
assert multistep_rows_supported(LANE, 1000, 256, 8), \
    "Halton multistep rows kernel"

# round-5: custom-target exact-NUTS (in-kernel vjp inside the tree build)
from mcmc_jl_tpu.ops.pallas_nuts import nuts_target_kernel_supported
assert nuts_target_kernel_supported(blockfn, LANE, 128, 6), \
    "target exact-NUTS kernel"
assert nuts_target_kernel_supported(blockfn, LANE, 128, 6, vec_eps=True), \
    "target exact-NUTS vec-eps kernel"

# round-5: multistep exact-NUTS (in-kernel PRNG, per-transition rows)
from mcmc_jl_tpu.ops.pallas_nuts import _ms_transition_inner
cd2 = f32((256, LANE), jnp.float32)
jax.jit(lambda XT, Y, th, lp, g, seeds: _ms_transition_inner(
    XT, Y, th, lp, g, seeds, jnp.float32(0.1), maxdoublings=6, k_trans=4,
    d=10, block_chains=256)).lower(
    f32((LANE, 1000), jnp.float32), f32((1, 1000), jnp.float32),
    cd2, f32((256,), jnp.float32), cd2,
    jax.ShapeDtypeStruct((1,), jnp.int32)).compile()
print("OK")
"""


@pytest.mark.tpu
def test_pallas_kernels_compile_on_tpu():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    out = subprocess.run(
        [sys.executable, "-c", _PROBE], cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=560, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    if "NO_TPU" in out.stdout:
        pytest.skip("no TPU backend available")
    assert "OK" in out.stdout, out.stdout + out.stderr[-2000:]
