"""Pallas fused multi-leapfrog HMC kernel for GLM posteriors.

The generic HMC path (samplers/hmc.py) issues one XLA ``value_and_grad`` per
leapfrog: for a GLM with C-vmapped chains that is a (C,d)x(d,N) matmul, an
elementwise link, and an (C,N)x(N,d) gradient matmul — with the (C,N) logits
round-tripping through HBM between ops.  This kernel fuses the *entire*
trajectory: positions, momenta, gradients and logits stay in VMEM across all
``n_leaps`` leapfrog steps, the matmuls hit the MXU back-to-back, and only
the final (theta, m, grad, logp) leave the chip memory.  (Reference hot loop:
src/samplers/HMC.jl:93-102 x evalallg — SURVEY §3.2 names this the #1
performance kernel.)

Model: Bayesian logistic regression with a N(0, I) prior —

    logp(theta) = Y.(X theta) - sum softplus(X theta) - ||theta||^2/2

Layout: the parameter dimension d is zero-padded to the 128-lane TPU tile;
padded components carry zero gradient and stay zero through the trajectory.
Chains are tiled over a 1-D grid; X^T (d_pad, N) and Y (1, N) are replicated
into VMEM per block.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def link_terms(kind):
    """Per-observation log-lik and residual factor for supported GLM links.

    ``ll(z, y)`` is the elementwise log-likelihood of linear predictor z;
    ``resid(z, y)`` is r such that d loglik / d theta = r @ X.
    """
    if kind == "logistic":
        return (
            lambda z, y: z * y - jax.nn.softplus(z),
            lambda z, y: y - jax.nn.sigmoid(z),
        )
    if kind == "linear":  # unit-variance Gaussian residuals
        return (
            lambda z, y: -0.5 * (y - z) * (y - z),
            lambda z, y: y - z,
        )
    if kind == "poisson":  # log link; the lgamma(y+1) constant is dropped
        return (
            lambda z, y: y * z - jnp.exp(z),
            lambda z, y: y - jnp.exp(z),
        )
    if kind == "probit":
        def _ll(z, y):
            return y * jsp_log_ndtr(z) + (1.0 - y) * jsp_log_ndtr(-z)

        def _resid(z, y):
            log_phi = -0.5 * z * z - 0.5 * jnp.log(2.0 * jnp.pi)
            w_pos = jnp.exp(log_phi - jsp_log_ndtr(z))
            w_neg = jnp.exp(log_phi - jsp_log_ndtr(-z))
            return y * w_pos - (1.0 - y) * w_neg

        return _ll, _resid
    raise ValueError(f"unknown GLM link {kind!r}")


def jsp_log_ndtr(z):
    from jax.scipy import special as jsp

    return jsp.log_ndtr(z)


def _kernel(eps_ref, xt_ref, y_ref, theta_ref, m_ref, grad_ref,
            theta_out, m_out, grad_out, lp_out, *, n_leaps, mxu_dtype, kind):
    """One HMC trajectory (n_leaps leapfrogs) for a block of chains."""
    eps = eps_ref[0, 0]
    xt = xt_ref[:].astype(mxu_dtype)   # (d_pad, N)
    xtt = xt_ref[:].T.astype(mxu_dtype)
    y = y_ref[:]              # (1, N)
    ll_fn, resid_fn = link_terms(kind)

    def grad_only(theta):
        # matmuls feed the MXU in mxu_dtype (bf16 doubles throughput on the
        # systolic array); accumulation stays f32.  Only the gradient is
        # needed inside the trajectory — the log-lik terms (softplus /
        # log_ndtr transcendentals) are evaluated once at the end.
        logits = jnp.dot(theta.astype(mxu_dtype), xt,
                         preferred_element_type=jnp.float32)  # (C, N)
        r = resid_fn(logits, y)
        # grad = r @ X - theta ; X = xt.T
        return jnp.dot(r.astype(mxu_dtype), xtt,
                       preferred_element_type=jnp.float32) - theta

    def logp_grad(theta):
        logits = jnp.dot(theta.astype(mxu_dtype), xt,
                         preferred_element_type=jnp.float32)
        r = resid_fn(logits, y)
        g = jnp.dot(r.astype(mxu_dtype), xtt,
                    preferred_element_type=jnp.float32) - theta
        lp = (
            jnp.sum(ll_fn(logits, y), axis=1, keepdims=True)
            - 0.5 * jnp.sum(theta * theta, axis=1, keepdims=True)
        )
        return lp, g

    def body(_, carry):
        theta, m, g = carry
        m = m + 0.5 * eps * g
        theta = theta + eps * m
        g = grad_only(theta)
        m = m + 0.5 * eps * g
        return theta, m, g

    theta, m, g = jax.lax.fori_loop(
        0, n_leaps, body, (theta_ref[:], m_ref[:], grad_ref[:])
    )
    lp, g = logp_grad(theta)

    theta_out[:] = theta
    m_out[:] = m
    grad_out[:] = g
    lp_out[:] = jnp.broadcast_to(lp, lp_out.shape)


@functools.partial(
    jax.jit,
    static_argnames=("n_leaps", "block_chains", "interpret", "mxu_dtype",
                     "kind"),
)
def glm_hmc_leapfrogs(XT, Y, theta, m, grad, eps, *, n_leaps=10,
                      block_chains=256, interpret=False,
                      mxu_dtype=jnp.float32, kind="logistic"):
    """Run ``n_leaps`` fused leapfrogs for all chains.

    Args:
      XT: (d_pad, N) transposed, lane-padded design matrix (see
          :func:`pad_design`).
      Y:  (1, N) responses.
      theta, m, grad: (C, d_pad) chain state (padded cols must be zero).
      eps: scalar leapfrog step.
    Returns: (theta, m, grad, logp) with logp shape (C,).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, d_pad = theta.shape
    N = XT.shape[1]
    blk = min(block_chains, C)
    assert C % blk == 0, f"chains ({C}) must divide block ({blk})"
    eps = jnp.float32(eps)

    grid = (C // blk,)
    chain_spec = pl.BlockSpec((blk, d_pad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n_leaps=n_leaps, mxu_dtype=mxu_dtype,
                          kind=kind),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((d_pad, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            chain_spec, chain_spec, chain_spec,
        ],
        out_specs=[chain_spec, chain_spec, chain_spec,
                   pl.BlockSpec((blk, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, LANE), theta.dtype),
        ],
        interpret=interpret,
    )(jnp.reshape(eps, (1, 1)), XT, Y, theta, m, grad)
    theta, m, grad, lp = out
    return theta, m, grad, lp[:, 0]


def pad_design(X, Y, dtype=jnp.float32):
    """(N, d) design + (N,) responses -> lane-padded (d_pad, N), (1, N)."""
    X = np.asarray(X)
    N, d = X.shape
    d_pad = _round_up(d, LANE)
    XT = np.zeros((d_pad, N), dtype=np.float32)
    XT[:d] = X.T
    return (jnp.asarray(XT, dtype=dtype),
            jnp.asarray(np.asarray(Y).reshape(1, N), dtype=dtype), d_pad)


def pad_chains(theta, d_pad):
    """(C, d) -> (C, d_pad) zero-padded."""
    C, d = theta.shape
    out = jnp.zeros((C, d_pad), dtype=theta.dtype)
    return out.at[:, :d].set(theta)
