"""Pallas fused multi-step random-walk Metropolis for arbitrary targets.

RWM (reference: src/samplers/RWM.jl:43-72) is one target eval per step — no
gradients, no matmuls — so on TPU the whole cost is elementwise VPU work
plus, if done naively, an HBM round-trip of the chain state and a host-side
threefry draw per step.  This kernel runs ``k_steps`` full RWM transitions
per launch with positions and log-targets VMEM-resident, drawing proposal
noise and Metropolis uniforms from the TPU's HARDWARE PRNG
(``pltpu.prng_random_bits``) — nothing enters or leaves the chip between
launches except the (C, d_pad) state once per ``k_steps`` transitions.

``noise="hw"`` (TPU production) uses the in-kernel hardware PRNG with
Box-Muller normals; ``noise="input"`` feeds pre-drawn noise through VMEM —
the CPU/interpret-testable path (Mosaic's PRNG primitives have no CPU
lowering), same transition math, used to validate the kernel against the
generic engine.  The two modes draw different streams but target the same
chain law.

``logp_block`` follows the :mod:`.pallas_target` contract (pure jnp,
padded lanes contribute zero, no captured array constants).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_glm import LANE, _round_up, pad_chains


def _uniform(shape):
    """U[0, 1) from hardware PRNG bits (24-bit mantissa fill)."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000),
                         jnp.float32) - 1.0


def _normal_hw(shape):
    """Standard normals via Box-Muller on hardware-PRNG uniforms."""
    u1 = 1.0 - _uniform(shape)  # (0, 1]: log is finite
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * np.pi) * u2)


def _rwm_kernel(*refs, logp_block, k_steps, noise):
    it = iter(refs)
    if noise == "hw":
        seed_ref = next(it)
    scale_ref, theta_ref = next(it), next(it)
    if noise == "input":
        z_ref, logu_ref = next(it), next(it)
    th_out, lp_out, acc_out = it

    if noise == "hw":
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        pltpu.prng_seed(seed_ref[pl.program_id(0), 0])

    scale = scale_ref[:]          # (1, d_pad); zero on padded lanes
    theta0 = theta_ref[:]
    blk, d_pad = theta0.shape
    lp0 = logp_block(theta0)      # (blk, 1)

    def draw(k):
        if noise == "hw":
            z = _normal_hw((blk, d_pad))
            logu = jnp.log(1.0 - _uniform((blk, LANE)))[:, 0:1]
            return z, logu
        from jax.experimental import pallas as pl

        # k is a traced fori_loop index: dynamic lane-dim slices via pl.ds
        z = z_ref[:, pl.ds(k * d_pad, d_pad)]
        logu = logu_ref[:, pl.ds(k * LANE, LANE)][:, 0:1]
        return z, logu

    def body(k, carry):
        theta, lp, acc = carry
        z, logu = draw(k)
        prop = theta + scale * z
        lp_p = logp_block(prop)
        ratio = lp_p - lp
        # NaN (e.g. -inf minus -inf) rejects — reference accept rule
        ratio = jnp.where(jnp.isnan(ratio), -jnp.inf, ratio)
        a = (ratio > 0) | (ratio > logu)                 # (blk, 1)
        aw = jnp.broadcast_to(a, theta.shape)
        theta = jnp.where(aw, prop, theta)
        lp = jnp.where(a, lp_p, lp)
        return theta, lp, acc + a.astype(jnp.float32)

    theta, lp, acc = jax.lax.fori_loop(
        0, k_steps, body, (theta0, lp0, jnp.zeros_like(lp0)))

    th_out[:] = theta
    lp_out[:] = jnp.broadcast_to(lp, lp_out.shape)
    acc_out[:] = jnp.broadcast_to(acc / k_steps, acc_out.shape)


def fused_target_rwm_steps(logp_block, theta, scale_row, *, k_steps,
                           seeds=None, z=None, logu=None, block_chains=256,
                           interpret=False, noise="hw"):
    """Run ``k_steps`` fused RWM transitions for all chains.

    Args:
      theta: (C, d_pad) lane-padded positions.
      scale_row: (1, d_pad) proposal scale (zero on padded lanes).
      seeds: (C // block_chains,) int32 per-block PRNG seeds (noise="hw").
      z: (C, k_steps * d_pad) pre-drawn normals (noise="input").
      logu: (C, k_steps * LANE) pre-drawn log-uniforms, lane-broadcast
        (noise="input").
    Returns (theta, logp (C,), accept_rate (C,)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, d_pad = theta.shape
    blk = min(block_chains, C)
    assert C % blk == 0, \
        f"block_chains ({blk}) must evenly divide the chain count ({C})"
    grid = (C // blk,)
    chain_spec = pl.BlockSpec((blk, d_pad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((blk, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    inputs, in_specs = [], []
    n_blocks = grid[0]
    if noise == "hw":
        assert seeds is not None and seeds.shape[0] == n_blocks
        # Mosaic requires SMEM blocks to cover the whole array; the kernel
        # picks its seed by program_id
        inputs.append(jnp.reshape(jnp.asarray(seeds, jnp.int32), (-1, 1)))
        in_specs.append(pl.BlockSpec((n_blocks, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
    inputs += [scale_row, theta]
    in_specs += [pl.BlockSpec((1, d_pad), lambda i: (0, 0),
                              memory_space=pltpu.VMEM), chain_spec]
    if noise == "input":
        assert z is not None and logu is not None
        inputs += [z, logu]
        in_specs += [
            pl.BlockSpec((blk, k_steps * d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, k_steps * LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]

    theta, lp, acc = pl.pallas_call(
        functools.partial(_rwm_kernel, logp_block=logp_block,
                          k_steps=k_steps, noise=noise),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid=grid,
        in_specs=in_specs,
        out_specs=[chain_spec, col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, LANE), theta.dtype),
            jax.ShapeDtypeStruct((C, LANE), theta.dtype),
        ],
        interpret=interpret,
    )(*inputs)
    return theta, lp[:, 0], acc[:, 0]


@functools.partial(jax.jit, static_argnames=(
    "logp_block", "d", "n_launches", "k_steps", "block_chains", "interpret",
    "noise"))
def _run(logp_block, theta0, scale_row, key, *, d, n_launches, k_steps,
         block_chains, interpret, noise):
    C, d_pad = theta0.shape
    n_blocks = C // min(block_chains, C)

    def launch(theta, k):
        if noise == "hw":
            seeds = jax.random.randint(k, (n_blocks,), 0, np.int32(2**31 - 1),
                                       dtype=jnp.int32)
            theta, lp, acc = fused_target_rwm_steps(
                logp_block, theta, scale_row, k_steps=k_steps, seeds=seeds,
                block_chains=block_chains, interpret=interpret, noise="hw")
        else:
            kz, ku = jax.random.split(k)
            z = jax.random.normal(kz, (C, k_steps * d_pad), jnp.float32)
            logu = jnp.log1p(-jax.random.uniform(
                ku, (C, k_steps), dtype=jnp.float32))
            logu = jnp.repeat(logu, LANE, axis=1)
            theta, lp, acc = fused_target_rwm_steps(
                logp_block, theta, scale_row, k_steps=k_steps, z=z,
                logu=logu, block_chains=block_chains, interpret=interpret,
                noise="input")
        info = {"ppars": theta[:, :d], "plogtarget": lp, "accept_rate": acc}
        return theta, info

    keys = jax.random.split(key, n_launches)
    return jax.lax.scan(launch, theta0, keys)


def run_target_rwm(logp_block, d, n_chains, steps, scale=0.1, thin=10,
                   seed=0, key=None, inits=None, block_chains=256,
                   interpret=False, noise=None):
    """Sample a custom target with the fused RWM kernel.

    ``steps`` total transitions run as ``steps // thin`` kernel launches of
    ``thin`` in-kernel steps each; infos carry one (thinned) row per launch
    — ``ppars``/``plogtarget``/``accept_rate`` with leading dim
    ``steps // thin``.  ``scale`` is a scalar or (d,) per-coordinate
    proposal scale.  ``noise`` defaults to "hw" on TPU, "input" elsewhere.
    """
    assert steps % thin == 0, "steps must be divisible by thin"
    if noise is None:
        noise = "hw" if (jax.default_backend() == "tpu"
                         and not interpret) else "input"
    d_pad = _round_up(d, LANE)
    if key is None:
        key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    if inits is None:
        inits = 0.1 * jax.random.normal(k_init, (n_chains, d),
                                        dtype=jnp.float32)
    theta0 = pad_chains(jnp.asarray(inits, jnp.float32), d_pad)
    scale_row = jnp.zeros((1, d_pad), jnp.float32).at[0, :d].set(
        jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (d,)))
    block = min(block_chains, n_chains)
    if n_chains % block != 0:
        from .glm_hmc import _pick_block

        block = _pick_block(n_chains)
    theta, infos = _run(
        logp_block, theta0, scale_row, k_run, d=d, n_launches=steps // thin,
        k_steps=thin, block_chains=block, interpret=interpret, noise=noise)
    return theta[:, :d], infos
