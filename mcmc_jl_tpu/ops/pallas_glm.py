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


from ..samplers.integrators import SCHEDULES


def _round_up(x, m):
    return (x + m - 1) // m * m


def _lam_input(prior_prec, vec_prior, d_pad, mat_prior=False):
    """Kernel input + BlockSpec for the prior precision: an SMEM scalar, a
    (vector-prior path) (1, d_pad) VMEM row padded with ones, or a
    (matrix-prior path) (d_pad, d_pad) VMEM block padded with an identity
    corner — padded lanes stay inert either way (their theta is exactly
    zero).  The matrix path carries the dense-mass fold ``lam L^T L`` of
    the warm-start pipeline (ops/warmstart.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if mat_prior:
        A = jnp.asarray(prior_prec, jnp.float32)
        k = A.shape[0]
        if k < d_pad:
            A = jnp.block(
                [[A, jnp.zeros((k, d_pad - k), jnp.float32)],
                 [jnp.zeros((d_pad - k, k), jnp.float32),
                  jnp.eye(d_pad - k, dtype=jnp.float32)]])
        return (A, pl.BlockSpec((d_pad, d_pad), lambda i: (0, 0),
                                memory_space=pltpu.VMEM))
    if vec_prior:
        lam = jnp.ravel(jnp.asarray(prior_prec, jnp.float32))
        lam = jnp.concatenate(
            [lam, jnp.ones(d_pad - lam.shape[0], jnp.float32)])
        return (jnp.reshape(lam, (1, d_pad)),
                pl.BlockSpec((1, d_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM))
    return (jnp.reshape(jnp.asarray(prior_prec, jnp.float32), (1, 1)),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM))


def is_mat_prior(prior_prec):
    """True when ``prior_prec`` is a full (d, d) precision matrix."""
    return (getattr(prior_prec, "ndim", 0) == 2
            and prior_prec.shape[0] > 1 and prior_prec.shape[1] > 1)


def is_vec_prior(prior_prec):
    """True when ``prior_prec`` is a per-coordinate precision vector."""
    return (getattr(prior_prec, "ndim", 0) >= 1 and np.size(prior_prec) > 1
            and not is_mat_prior(prior_prec))


def link_terms(kind, kernel=False):
    """Per-observation log-lik and residual factor for supported GLM links.

    ``ll(z, y)`` is the elementwise log-likelihood of linear predictor z;
    ``resid(z, y)`` is r such that d loglik / d theta = r @ X.

    ``kind`` is a link name, or a ``(ll, resid)`` pair of jax-traceable
    elementwise callables for custom likelihoods (they run inside the fused
    kernel, so any family whose log-lik is elementwise in the linear
    predictor gets the speed-of-light path).

    ``kernel=True`` (set by the Pallas kernels) swaps any special function
    Mosaic cannot lower for the kernel-safe equivalents in
    :mod:`mcmc_jl_tpu.ops.special` (probit: ``log_ndtr`` without ``erf``,
    abs err < 4e-6); XLA callers keep the exact jax.scipy versions.
    """
    if isinstance(kind, tuple):
        ll_fn, resid_fn = kind
        assert callable(ll_fn) and callable(resid_fn), (
            "custom link must be a (ll(z, y), resid(z, y)) pair of callables"
        )
        return ll_fn, resid_fn
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
        if kernel:
            from .special import log_ndtr
        else:
            log_ndtr = jsp_log_ndtr

        def _ll(z, y):
            return y * log_ndtr(z) + (1.0 - y) * log_ndtr(-z)

        def _resid(z, y):
            log_phi = -0.5 * z * z - 0.5 * jnp.log(2.0 * jnp.pi)
            w_pos = jnp.exp(log_phi - log_ndtr(z))
            w_neg = jnp.exp(log_phi - log_ndtr(-z))
            return y * w_pos - (1.0 - y) * w_neg

        return _ll, _resid
    raise ValueError(f"unknown GLM link {kind!r}")


def jsp_log_ndtr(z):
    from jax.scipy import special as jsp

    return jsp.log_ndtr(z)


def _glm_funcs(xt_ref, y_ref, w_ref, o_ref, lam, *, mxu_dtype, kind,
               use_w, use_o, unit_prior, mat_prior=False):
    """Build (grad_only, logp_grad) closures over VMEM-resident GLM data.

    Shared by the trajectory kernel and the full-transition kernel.
    ``use_w``/``use_o``/``unit_prior`` are trace-time flags: the default
    unweighted / no-offset / unit-prior path compiles with zero extra ops
    (and zero extra VMEM inputs) in the hot loop.  ``lam`` is a scalar, a
    (1, d_pad) per-coordinate precision row (diag-mass fold), or —
    ``mat_prior=True`` — a (d_pad, d_pad) precision matrix (dense-mass
    fold ``lam L^T L``, one extra MXU matmul per gradient); see
    ops/warmstart.py."""
    xt = xt_ref[:].astype(mxu_dtype)   # (d_pad, N)
    y = y_ref[:]              # (1, N)
    w = w_ref[:] if use_w else None   # (1, N) per-observation weights
    o = o_ref[:] if use_o else None   # (1, N) linear-predictor offsets
    ll_fn, resid_fn = link_terms(kind, kernel=True)

    def predictor(theta):
        z = jnp.dot(theta.astype(mxu_dtype), xt,
                    preferred_element_type=jnp.float32)  # (C, N)
        return z + o if use_o else z

    def prior_grad(theta):
        if mat_prior:  # symmetric A: grad of theta^T A theta / 2 = theta A
            return jnp.dot(theta, lam, preferred_element_type=jnp.float32)
        return lam * theta if not unit_prior else theta

    def rxt(r):
        # r @ X as a dot_general contracting r.1 with xt.1 — the MXU takes
        # either operand orientation; materializing an explicit (N, d_pad)
        # transpose of xt in VMEM costs a 128x1000 shuffle per kernel launch
        # and doubles the replicated design matrix's VMEM footprint.
        return jax.lax.dot_general(
            r.astype(mxu_dtype), xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def grad_only(theta):
        # matmuls feed the MXU in mxu_dtype; accumulation stays f32.  Only
        # the gradient is needed inside the trajectory — the log-lik terms
        # (softplus / log_ndtr transcendentals) are evaluated once at the
        # end of the trajectory.
        r = resid_fn(predictor(theta), y)
        if use_w:
            r = w * r
        return rxt(r) - prior_grad(theta)

    def logp_grad(theta):
        logits = predictor(theta)
        r = resid_fn(logits, y)
        ll = ll_fn(logits, y)
        if use_w:
            r = w * r
            ll = w * ll
        g = rxt(r) - prior_grad(theta)
        # sum(prior_grad(theta)*theta) covers scalar, vector AND matrix lam
        quad = jnp.sum(prior_grad(theta) * theta, axis=1, keepdims=True)
        lp = jnp.sum(ll, axis=1, keepdims=True) - 0.5 * quad
        return lp, g

    return grad_only, logp_grad


def _trajectory(theta, m, g, eps, grad_only, logp_grad, *, n_leaps,
                integrator):
    """n_leaps macro steps of the trace-time integrator body generated from
    the shared kick/drift schedule (samplers/integrators.py SCHEDULES — the
    single source of truth for the scheme coefficients): per macro step,
    leapfrog costs 1 grad matmul pair, 2stage 2, 3stage 3.

    The final macro step is peeled out of the loop and its last drift uses
    ``logp_grad`` instead of ``grad_only``, so the trajectory-end log-target
    comes out of the SAME forward pass as the last gradient — a separate
    end-of-trajectory ``logp_grad`` call would spend one extra
    forward+backward matmul pair per trajectory (~9% of the whole kernel at
    n_leaps=10).  Returns (theta, m, g, lp)."""
    schedule = SCHEDULES[integrator]
    last_d = max(i for i, (op, _) in enumerate(schedule) if op == "A")

    def macro(theta, m, g, final):
        lp = None
        for j, (op, c) in enumerate(schedule):
            if op == "B":
                m = m + c * eps * g
            else:
                theta = theta + c * eps * m
                if final and j == last_d:
                    lp, g = logp_grad(theta)
                else:
                    g = grad_only(theta)
        return theta, m, g, lp

    theta, m, g = jax.lax.fori_loop(
        0, n_leaps - 1,
        lambda _, c: macro(*c, False)[:3], (theta, m, g))
    return macro(theta, m, g, True)


def _kernel(*refs, n_leaps, mxu_dtype, kind, use_w, use_o, unit_prior,
            vec_prior=False, mat_prior=False, dyn_len=False,
            integrator="leapfrog"):
    """One HMC trajectory (n_leaps leapfrogs) for a block of chains.

    ``dyn_len=True`` reads the leap count from an SMEM scalar instead of the
    static ``n_leaps`` — the trajectory loop gets a runtime trip count, so
    ONE compiled kernel serves every per-step jittered length of a
    ChEES-HMC sampling phase (ops/warmstart.py)."""
    it = iter(refs)
    eps_ref = next(it)
    nl_ref = next(it) if dyn_len else None
    lam_ref, xt_ref, y_ref = (next(it) for _ in range(3))
    w_ref = next(it) if use_w else None
    o_ref = next(it) if use_o else None
    theta_ref, m_ref, grad_ref = (next(it) for _ in range(3))
    theta_out, m_out, grad_out, lp_out = list(it)

    eps = eps_ref[0, 0]
    # N(0, 1/lam) prior precision: scalar, (1, d_pad) row, or (d_pad,
    # d_pad) matrix (dense-mass fold)
    lam = lam_ref[:] if (vec_prior or mat_prior) else lam_ref[0, 0]
    grad_only, logp_grad = _glm_funcs(
        xt_ref, y_ref, w_ref, o_ref, lam, mxu_dtype=mxu_dtype, kind=kind,
        use_w=use_w, use_o=use_o, unit_prior=unit_prior,
        mat_prior=mat_prior)

    nl = nl_ref[0, 0] if dyn_len else n_leaps
    theta, m, g, lp = _trajectory(theta_ref[:], m_ref[:], grad_ref[:], eps,
                                  grad_only, logp_grad, n_leaps=nl,
                                  integrator=integrator)

    theta_out[:] = theta
    m_out[:] = m
    grad_out[:] = g
    lp_out[:] = jnp.broadcast_to(lp, lp_out.shape)


def _step_kernel(*refs, n_leaps, mxu_dtype, kind, use_w, use_o, unit_prior,
                 vec_prior=False, mat_prior=False, integrator="leapfrog"):
    """One FULL HMC transition for a block of chains: momentum refresh
    (pre-drawn noise in), whole trajectory, Metropolis accept — nothing but
    the noise generation stays outside the kernel.  Compared to launching
    the trajectory kernel and doing accept/refresh in XLA, this keeps the
    (C, d_pad) state entirely in VMEM across the transition and removes
    ~10 HBM round-trips per step (reference hot loop: HMC.jl:136-165)."""
    it = iter(refs)
    eps_ref, lam_ref, xt_ref, y_ref = (next(it) for _ in range(4))
    w_ref = next(it) if use_w else None
    o_ref = next(it) if use_o else None
    theta_ref, grad_ref, lp_ref, m0_ref, logu_ref = (next(it)
                                                     for _ in range(5))
    theta_out, grad_out, lp_out, acc_out = list(it)

    eps = eps_ref[0, 0]
    lam = lam_ref[:] if (vec_prior or mat_prior) else lam_ref[0, 0]
    grad_only, logp_grad = _glm_funcs(
        xt_ref, y_ref, w_ref, o_ref, lam, mxu_dtype=mxu_dtype, kind=kind,
        use_w=use_w, use_o=use_o, unit_prior=unit_prior,
        mat_prior=mat_prior)

    # per-chain scalars arrive lane-broadcast as (blk, LANE) blocks — Mosaic
    # cannot tile a (blk, 1) VMEM block (the round-1 lowering failure); only
    # lane 0 is meaningful, sliced to (blk, 1) as in-register values.
    th0, g0 = theta_ref[:], grad_ref[:]
    lp0 = lp_ref[:][:, 0:1]
    logu = logu_ref[:][:, 0:1]
    m0 = m0_ref[:]                     # pre-masked: zero on padded lanes
    h0 = -lp0 + 0.5 * jnp.sum(m0 * m0, axis=1, keepdims=True)

    theta, m, g, lp = _trajectory(th0, m0, g0, eps, grad_only, logp_grad,
                                  n_leaps=n_leaps, integrator=integrator)
    h = -lp + 0.5 * jnp.sum(m * m, axis=1, keepdims=True)
    ratio = h0 - h
    # reference accept rule incl. NaN-reject (glm_hmc.py parity).  NaN is
    # scrubbed with a FLOAT select (a bool-valued select_n on a (blk, 1)
    # vector hits an unsupported i8->i1 truncation in Mosaic), and every
    # select runs at full lane width on an explicitly broadcast mask.
    ratio = jnp.where(jnp.isnan(ratio), -jnp.inf, ratio)
    acc = (ratio > 0) | (ratio > logu)                     # (blk, 1) mask
    accw = jnp.broadcast_to(acc, th0.shape)
    theta_out[:] = jnp.where(accw, theta, th0)
    grad_out[:] = jnp.where(accw, g, g0)
    accl = jnp.broadcast_to(acc, lp_out.shape)
    lp_out[:] = jnp.where(accl, jnp.broadcast_to(lp, lp_out.shape),
                          jnp.broadcast_to(lp0, lp_out.shape))
    acc_out[:] = accl.astype(jnp.float32)


def _vdc2_scalar(i, nbits=31):
    """Van der Corput radical inverse base 2 of a shared non-negative i32
    scalar (the ChEES Halton jitter, samplers/chees.py halton2) via
    unrolled bit tests — pure scalar arithmetic, Mosaic-safe."""
    u = jnp.float32(0.0)
    for b in range(nbits):
        u = u + ((i >> b) & 1).astype(jnp.float32) * jnp.float32(
            0.5 ** (b + 1))
    return u


def _multistep_kernel(*refs, d, n_leaps, k_trans, mxu_dtype, kind, use_w,
                      use_o, unit_prior, vec_prior=False, mat_prior=False,
                      integrator="leapfrog", halton=False,
                      collect_rows=False, rows_extras=False):
    """``k_trans`` FULL HMC transitions for a block of chains in ONE kernel
    launch: momentum refresh (Box-Muller on the hardware PRNG) + whole
    trajectory + Metropolis accept, all VMEM-resident.  Between launches
    only (theta, grad, lp, accept-count) touch HBM — per transition the
    only cost is the trajectory matmuls themselves.  (The single-transition
    kernels pay per-step XLA refresh/select work and a state round-trip;
    measured ~8% of the headline config.)

    ``halton=True`` (round 5, VERDICT r4 next #3): each in-kernel
    transition integrates a SHARED Halton-jittered leap count
    ``clip(ceil(vdc2(i0+t) T / eps), 1, max_leaps)`` computed from the
    step counter — the ChEES / warm-start length rule served WITHOUT one
    kernel launch (and its XLA refresh/accept glue) per transition.
    Extra SMEM inputs: i0 (i32), T (f32), max_leaps (i32).

    ``collect_rows=True``: per-transition post-accept rows
    (theta, grad, lp, accept [, alpha, nleaps with halton]) are written to
    rank-3 ``(k_trans, blk, .)`` output blocks — the full per-step info
    protocol of the warm sampling/continuation phases at multistep cost.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .pallas_rwm import _normal_hw, _uniform

    it = iter(refs)
    seed_ref, eps_ref = next(it), next(it)
    if halton:
        i0_ref, t_ref, maxl_ref = (next(it) for _ in range(3))
    lam_ref, xt_ref, y_ref = (next(it) for _ in range(3))
    w_ref = next(it) if use_w else None
    o_ref = next(it) if use_o else None
    theta_ref = next(it)
    theta_out, grad_out, lp_out, acc_out = (next(it) for _ in range(4))
    if collect_rows:
        r_theta, r_grad, r_lp, r_acc = (next(it) for _ in range(4))
        if rows_extras:
            r_alpha, r_nl = next(it), next(it)

    pltpu.prng_seed(seed_ref[pl.program_id(0), 0])
    eps = eps_ref[0, 0]
    if halton:
        i0 = i0_ref[0, 0]
        T = t_ref[0, 0]
        max_l = maxl_ref[0, 0]
    lam = lam_ref[:] if (vec_prior or mat_prior) else lam_ref[0, 0]
    grad_only, logp_grad = _glm_funcs(
        xt_ref, y_ref, w_ref, o_ref, lam, mxu_dtype=mxu_dtype, kind=kind,
        use_w=use_w, use_o=use_o, unit_prior=unit_prior,
        mat_prior=mat_prior)

    theta0 = theta_ref[:]
    blk, d_pad = theta0.shape
    live = jax.lax.broadcasted_iota(jnp.int32, (blk, d_pad), 1) < d
    lp0, g0 = logp_grad(theta0)

    def body(t, carry):
        theta, lp, g, acc = carry
        if halton:
            u = _vdc2_scalar(i0 + t)
            nl = jnp.clip(jnp.ceil(u * T / eps), 1,
                          max_l.astype(jnp.float32)).astype(jnp.int32)
        else:
            nl = n_leaps
        m0 = jnp.where(live, _normal_hw((blk, d_pad)), 0.0)
        logu = jnp.log(1.0 - _uniform((blk, LANE)))[:, 0:1]
        h0 = -lp + 0.5 * jnp.sum(m0 * m0, axis=1, keepdims=True)
        th_p, m, g_p, lp_p = _trajectory(theta, m0, g, eps, grad_only,
                                         logp_grad, n_leaps=nl,
                                         integrator=integrator)
        h = -lp_p + 0.5 * jnp.sum(m * m, axis=1, keepdims=True)
        ratio = h0 - h
        ratio = jnp.where(jnp.isnan(ratio), -jnp.inf, ratio)
        a = (ratio > 0) | (ratio > logu)                   # (blk, 1)
        aw = jnp.broadcast_to(a, theta.shape)
        theta = jnp.where(aw, th_p, theta)
        g = jnp.where(aw, g_p, g)
        lp = jnp.where(a, lp_p, lp)
        if collect_rows:
            r_theta[t] = theta
            r_grad[t] = g
            r_lp[t] = jnp.broadcast_to(lp, (blk, LANE))
            r_acc[t] = jnp.broadcast_to(a.astype(jnp.float32), (blk, LANE))
            if rows_extras:
                alpha = jnp.exp(jnp.minimum(ratio, 0.0))
                r_alpha[t] = jnp.broadcast_to(alpha, (blk, LANE))
                r_nl[t] = jnp.full((blk, LANE), nl.astype(jnp.float32))
        return theta, lp, g, acc + a.astype(jnp.float32)

    theta, lp, g, acc = jax.lax.fori_loop(
        0, k_trans, body, (theta0, lp0, g0, jnp.zeros_like(lp0)))

    theta_out[:] = theta
    grad_out[:] = g
    lp_out[:] = jnp.broadcast_to(lp, lp_out.shape)
    acc_out[:] = jnp.broadcast_to(acc / k_trans, acc_out.shape)


@functools.partial(
    jax.jit,
    static_argnames=("d", "n_leaps", "k_trans", "block_chains", "mxu_dtype",
                     "kind", "_use_w", "_use_o", "_unit_prior", "_vec_prior",
                     "_mat_prior", "integrator"),
)
def _multistep_inner(XT, Y, theta, seeds, eps, *, d, n_leaps=10, k_trans=10,
                     block_chains=256, mxu_dtype=jnp.float32,
                     kind="logistic", weights=None, offsets=None,
                     prior_prec=1.0, _use_w=False, _use_o=False,
                     _unit_prior=True, _vec_prior=False, _mat_prior=False,
                     integrator="leapfrog"):
    """Launch the multi-transition kernel once (see ``_multistep_kernel``).

    TPU-only (hardware PRNG has no CPU/interpret lowering).  Returns
    (theta, grad, lp (C,), accept_rate (C,)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, d_pad = theta.shape
    N = XT.shape[1]
    blk = min(block_chains, C)
    assert C % blk == 0, \
        f"block_chains ({blk}) must evenly divide the chain count ({C})"
    n_blocks = C // blk
    eps = jnp.float32(eps)
    lam_in, lam_spec = _lam_input(prior_prec, _vec_prior, d_pad,
                                  mat_prior=_mat_prior)

    grid = (n_blocks,)
    chain_spec = pl.BlockSpec((blk, d_pad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((blk, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    obs_spec = pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM)

    inputs = [jnp.reshape(jnp.asarray(seeds, jnp.int32), (n_blocks, 1)),
              jnp.reshape(eps, (1, 1)), lam_in, XT, Y]
    in_specs = [
        pl.BlockSpec((n_blocks, 1), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        smem_spec, lam_spec,
        pl.BlockSpec((d_pad, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        obs_spec,
    ]
    if _use_w:
        inputs.append(jnp.reshape(jnp.asarray(weights, jnp.float32), (1, N)))
        in_specs.append(obs_spec)
    if _use_o:
        inputs.append(jnp.reshape(jnp.asarray(offsets, jnp.float32), (1, N)))
        in_specs.append(obs_spec)
    inputs.append(theta)
    in_specs.append(chain_spec)

    theta, grad, lp, acc = pl.pallas_call(
        functools.partial(_multistep_kernel, d=d, n_leaps=n_leaps,
                          k_trans=k_trans, mxu_dtype=mxu_dtype, kind=kind,
                          use_w=_use_w, use_o=_use_o,
                          unit_prior=_unit_prior, vec_prior=_vec_prior,
                          mat_prior=_mat_prior, integrator=integrator),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid=grid,
        in_specs=in_specs,
        out_specs=[chain_spec, chain_spec, col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, LANE), theta.dtype),
            jax.ShapeDtypeStruct((C, LANE), theta.dtype),
        ],
    )(*inputs)
    return theta, grad, lp[:, 0], acc[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("d", "k_trans", "block_chains", "mxu_dtype", "kind",
                     "_use_w", "_use_o", "_unit_prior", "_vec_prior",
                     "_mat_prior", "integrator", "_extras"),
)
def _multistep_rows_inner(XT, Y, theta, seeds, eps, T, i0, max_leaps, *,
                          d, k_trans=10, block_chains=256,
                          mxu_dtype=jnp.float32, kind="logistic",
                          weights=None, offsets=None, prior_prec=1.0,
                          _use_w=False, _use_o=False, _unit_prior=True,
                          _vec_prior=False, _mat_prior=False,
                          integrator="leapfrog", _extras=True):
    """Launch the Halton-length multi-transition kernel once with
    per-transition ROW outputs (see ``_multistep_kernel`` halton /
    collect_rows).  TPU-only (hardware PRNG).  Returns
    (theta, grad, lp (C,), rows) with rows = dict of (k_trans, C, ...)
    post-accept per-transition arrays (ppars/pgrads/plogtarget/accept/
    alpha/nleaps — theta-sliced to d by the caller)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, d_pad = theta.shape
    N = XT.shape[1]
    blk = min(block_chains, C)
    assert C % blk == 0, \
        f"block_chains ({blk}) must evenly divide the chain count ({C})"
    n_blocks = C // blk
    lam_in, lam_spec = _lam_input(prior_prec, _vec_prior, d_pad,
                                  mat_prior=_mat_prior)

    grid = (n_blocks,)
    chain_spec = pl.BlockSpec((blk, d_pad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((blk, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    row3_vec = pl.BlockSpec((k_trans, blk, d_pad), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    row3_col = pl.BlockSpec((k_trans, blk, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    obs_spec = pl.BlockSpec((1, N), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    inputs = [jnp.reshape(jnp.asarray(seeds, jnp.int32), (n_blocks, 1)),
              jnp.reshape(jnp.float32(eps), (1, 1)),
              jnp.reshape(jnp.asarray(i0, jnp.int32), (1, 1)),
              jnp.reshape(jnp.float32(T), (1, 1)),
              jnp.reshape(jnp.asarray(max_leaps, jnp.int32), (1, 1)),
              lam_in, XT, Y]
    in_specs = [
        pl.BlockSpec((n_blocks, 1), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        smem_spec, smem_spec, smem_spec, smem_spec, lam_spec,
        pl.BlockSpec((d_pad, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        obs_spec,
    ]
    if _use_w:
        inputs.append(jnp.reshape(jnp.asarray(weights, jnp.float32), (1, N)))
        in_specs.append(obs_spec)
    if _use_o:
        inputs.append(jnp.reshape(jnp.asarray(offsets, jnp.float32), (1, N)))
        in_specs.append(obs_spec)
    inputs.append(theta)
    in_specs.append(chain_spec)

    f32 = jax.ShapeDtypeStruct
    out = pl.pallas_call(
        functools.partial(_multistep_kernel, d=d, n_leaps=0,
                          k_trans=k_trans, mxu_dtype=mxu_dtype, kind=kind,
                          use_w=_use_w, use_o=_use_o,
                          unit_prior=_unit_prior, vec_prior=_vec_prior,
                          mat_prior=_mat_prior, integrator=integrator,
                          halton=True, collect_rows=True,
                          rows_extras=_extras),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid=grid,
        in_specs=in_specs,
        out_specs=[chain_spec, chain_spec, col_spec, col_spec,
                   row3_vec, row3_vec, row3_col, row3_col]
        + ([row3_col, row3_col] if _extras else []),
        out_shape=[
            f32((C, d_pad), theta.dtype),
            f32((C, d_pad), theta.dtype),
            f32((C, LANE), theta.dtype),
            f32((C, LANE), theta.dtype),
            f32((k_trans, C, d_pad), theta.dtype),
            f32((k_trans, C, d_pad), theta.dtype),
            f32((k_trans, C, LANE), theta.dtype),
            f32((k_trans, C, LANE), theta.dtype),
        ] + ([f32((k_trans, C, LANE), theta.dtype)] * 2 if _extras
             else []),
    )(*inputs)
    theta, grad, lp, _acc, r_th, r_g, r_lp, r_a = out[:8]
    rows = {"ppars": r_th, "pgrads": r_g, "plogtarget": r_lp[..., 0],
            "accept": r_a[..., 0] > 0.5}
    if _extras:
        rows["alpha"] = out[8][..., 0]
        rows["nleaps"] = out[9][..., 0].astype(jnp.int32)
    return theta, grad, lp[:, 0], rows


_MS_ROWS_PROBE_CACHE = {}


def multistep_rows_supported(d_pad, N, blk, k_trans, kind="logistic",
                             use_w=False, use_o=False, unit_prior=True,
                             vec_prior=False, mat_prior=False,
                             integrator="leapfrog"):
    """Compile-probe the Halton-length row-collecting multistep kernel
    (rank-3 dynamic-index output stores + in-kernel PRNG stress Mosaic;
    the warm phases must degrade to the per-transition composed driver,
    never hard-fail)."""
    sig = (d_pad, N, blk, k_trans,
           kind if isinstance(kind, str) else id(kind), use_w, use_o,
           unit_prior, vec_prior, mat_prior, integrator,
           jax.default_backend())
    hit = _MS_ROWS_PROBE_CACHE.get(sig)
    if hit is not None:
        return hit
    f32 = jax.ShapeDtypeStruct
    cd = f32((blk, d_pad), jnp.float32)
    extra = []
    if use_w:
        extra.append(f32((1, N), jnp.float32))
    if use_o:
        extra.append(f32((1, N), jnp.float32))
    if vec_prior:
        extra.append(f32((1, d_pad), jnp.float32))
    if mat_prior:
        extra.append(f32((d_pad, d_pad), jnp.float32))

    def probe(XT, Y, th, seeds, *wo):
        kw = dict(d=max(d_pad - LANE + 1, 1), k_trans=k_trans,
                  block_chains=blk, kind=kind,
                  prior_prec=1.0 if unit_prior else 0.5,
                  integrator=integrator)
        it = iter(wo)
        if use_w:
            kw["weights"] = next(it)
        if use_o:
            kw["offsets"] = next(it)
        if vec_prior or mat_prior:
            kw["prior_prec"] = next(it)
        return _multistep_rows_inner(
            XT, Y, th, seeds, jnp.float32(0.1), jnp.float32(1.0),
            jnp.asarray(1, jnp.int32), jnp.asarray(8, jnp.int32),
            _use_w=use_w, _use_o=use_o, _unit_prior=unit_prior,
            _vec_prior=vec_prior, _mat_prior=mat_prior, **kw)

    try:
        jax.jit(probe).lower(
            f32((d_pad, N), jnp.float32), f32((1, N), jnp.float32),
            cd, jax.ShapeDtypeStruct((1,), jnp.int32), *extra,
        ).compile()
        ok = True
    except Exception as e:  # pragma: no cover - backend-specific
        import logging

        logging.getLogger(__name__).warning(
            "Halton multistep rows kernel failed to compile on %s (%s); "
            "using the composed per-transition driver",
            jax.default_backend(), type(e).__name__)
        ok = False
    _MS_ROWS_PROBE_CACHE[sig] = ok
    return ok


@functools.partial(
    jax.jit,
    static_argnames=("n_leaps", "block_chains", "interpret", "mxu_dtype",
                     "kind", "_use_w", "_use_o", "_unit_prior", "_vec_prior",
                     "_mat_prior", "_dyn_len", "integrator"),
)
def _leapfrogs_inner(XT, Y, theta, m, grad, eps, *, n_leaps=10, nl=None,
                     block_chains=256, interpret=False,
                     mxu_dtype=jnp.float32, kind="logistic",
                     weights=None, offsets=None, prior_prec=1.0,
                     _use_w=False, _use_o=False, _unit_prior=True,
                     _vec_prior=False, _mat_prior=False, _dyn_len=False,
                     integrator="leapfrog"):
    """Run ``n_leaps`` fused leapfrogs for all chains.

    Args:
      XT: (d_pad, N) transposed, lane-padded design matrix (see
          :func:`pad_design`).
      Y:  (1, N) responses.
      theta, m, grad: (C, d_pad) chain state (padded cols must be zero).
      eps: scalar leapfrog step.
      kind: link name or custom ``(ll, resid)`` callable pair.
      weights: optional (N,) or (1, N) per-observation log-lik weights.
      offsets: optional (N,) or (1, N) linear-predictor offsets.
      prior_prec: N(0, 1/lam I) prior precision lam (traced scalar OK).
    Returns: (theta, m, grad, logp) with logp shape (C,).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, d_pad = theta.shape
    N = XT.shape[1]
    blk = min(block_chains, C)
    assert C % blk == 0, \
        f"block_chains ({blk}) must evenly divide the chain count ({C})"
    eps = jnp.float32(eps)
    lam_in, lam_spec = _lam_input(prior_prec, _vec_prior, d_pad,
                                  mat_prior=_mat_prior)

    grid = (C // blk,)
    chain_spec = pl.BlockSpec((blk, d_pad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    obs_spec = pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM)

    inputs = [jnp.reshape(eps, (1, 1))]
    in_specs = [smem_spec]
    if _dyn_len:
        inputs.append(jnp.reshape(jnp.asarray(nl, jnp.int32), (1, 1)))
        in_specs.append(smem_spec)
    inputs += [lam_in, XT, Y]
    in_specs += [
        lam_spec,
        pl.BlockSpec((d_pad, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        obs_spec,
    ]
    if _use_w:
        inputs.append(jnp.reshape(jnp.asarray(weights, jnp.float32), (1, N)))
        in_specs.append(obs_spec)
    if _use_o:
        inputs.append(jnp.reshape(jnp.asarray(offsets, jnp.float32), (1, N)))
        in_specs.append(obs_spec)
    inputs += [theta, m, grad]
    in_specs += [chain_spec, chain_spec, chain_spec]

    # default scoped-VMEM budget is 16 MiB; v5e has 128 MiB per core.  A
    # larger budget admits bigger chain blocks (fewer grid steps => less
    # re-staging of the replicated X^T block) and the bf16 MXU path.
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_kernel, n_leaps=n_leaps, mxu_dtype=mxu_dtype,
                          kind=kind, use_w=_use_w, use_o=_use_o,
                          unit_prior=_unit_prior, vec_prior=_vec_prior,
                          mat_prior=_mat_prior, dyn_len=_dyn_len,
                          integrator=integrator),
        compiler_params=params,
        grid=grid,
        in_specs=in_specs,
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
    )(*inputs)
    theta, m, grad, lp = out
    return theta, m, grad, lp[:, 0]


def glm_hmc_leapfrogs(XT, Y, theta, m, grad, eps, *, n_leaps=10,
                      block_chains=256, interpret=False,
                      mxu_dtype=jnp.float32, kind="logistic",
                      weights=None, offsets=None, prior_prec=1.0,
                      integrator="leapfrog"):
    """Public fused-trajectory entry (docs on :func:`_leapfrogs_inner`).
    Derives the trace-time specialization flags, so the default call compiles
    the exact pre-extension kernel.  ``n_leaps`` may be a traced i32 scalar
    (runtime trip count — the ChEES dynamic-length path)."""
    unit = isinstance(prior_prec, (int, float)) and float(prior_prec) == 1.0
    dyn = not isinstance(n_leaps, int)
    return _leapfrogs_inner(
        XT, Y, theta, m, grad, eps,
        n_leaps=0 if dyn else n_leaps, nl=n_leaps if dyn else None,
        block_chains=block_chains, interpret=interpret, mxu_dtype=mxu_dtype,
        kind=kind, weights=weights, offsets=offsets, prior_prec=prior_prec,
        _use_w=weights is not None, _use_o=offsets is not None,
        _unit_prior=unit, _vec_prior=is_vec_prior(prior_prec),
        _mat_prior=is_mat_prior(prior_prec),
        _dyn_len=dyn, integrator=integrator,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_leaps", "block_chains", "interpret", "mxu_dtype",
                     "kind", "_use_w", "_use_o", "_unit_prior", "_vec_prior",
                     "_mat_prior", "integrator"),
)
def _step_inner(XT, Y, theta, grad, lp, m0, logu, eps, *, n_leaps=10,
                block_chains=256, interpret=False, mxu_dtype=jnp.float32,
                kind="logistic", weights=None, offsets=None, prior_prec=1.0,
                _use_w=False, _use_o=False, _unit_prior=True,
                _vec_prior=False, _mat_prior=False, integrator="leapfrog"):
    """Run one fused HMC transition (refresh + trajectory + accept).

    Args beyond :func:`_leapfrogs_inner`:
      lp:   (C, 1) current log-target.
      m0:   (C, d_pad) refreshed momenta (zero on padded lanes).
      logu: (C, 1) log-uniform draws for the Metropolis test.
    Returns (theta, grad, lp (C,1), accept (C,1) as f32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, d_pad = theta.shape
    N = XT.shape[1]
    blk = min(block_chains, C)
    assert C % blk == 0, \
        f"block_chains ({blk}) must evenly divide the chain count ({C})"
    eps = jnp.float32(eps)
    lam_in, lam_spec = _lam_input(prior_prec, _vec_prior, d_pad,
                                  mat_prior=_mat_prior)

    grid = (C // blk,)
    chain_spec = pl.BlockSpec((blk, d_pad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    # per-chain scalars ride (blk, LANE) lane-broadcast blocks: Mosaic
    # refuses (blk, 1) VMEM tiles (see _step_kernel)
    col_spec = pl.BlockSpec((blk, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    obs_spec = pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM)

    inputs = [jnp.reshape(eps, (1, 1)), lam_in, XT, Y]
    in_specs = [
        smem_spec, lam_spec,
        pl.BlockSpec((d_pad, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        obs_spec,
    ]
    if _use_w:
        inputs.append(jnp.reshape(jnp.asarray(weights, jnp.float32), (1, N)))
        in_specs.append(obs_spec)
    if _use_o:
        inputs.append(jnp.reshape(jnp.asarray(offsets, jnp.float32), (1, N)))
        in_specs.append(obs_spec)
    lp_w = jnp.broadcast_to(jnp.reshape(lp, (C, 1)), (C, LANE))
    logu_w = jnp.broadcast_to(jnp.reshape(logu, (C, 1)), (C, LANE))
    inputs += [theta, grad, lp_w, m0, logu_w]
    in_specs += [chain_spec, chain_spec, col_spec, chain_spec, col_spec]

    theta, grad, lp, acc = pl.pallas_call(
        functools.partial(_step_kernel, n_leaps=n_leaps, mxu_dtype=mxu_dtype,
                          kind=kind, use_w=_use_w, use_o=_use_o,
                          unit_prior=_unit_prior, vec_prior=_vec_prior,
                          mat_prior=_mat_prior, integrator=integrator),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid=grid,
        in_specs=in_specs,
        out_specs=[chain_spec, chain_spec, col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, LANE), theta.dtype),
            jax.ShapeDtypeStruct((C, LANE), theta.dtype),
        ],
        interpret=interpret,
    )(*inputs)
    return theta, grad, lp[:, :1], acc[:, :1]


def glm_hmc_step(XT, Y, theta, grad, lp, m0, logu, eps, *, n_leaps=10,
                 block_chains=256, interpret=False, mxu_dtype=jnp.float32,
                 kind="logistic", weights=None, offsets=None, prior_prec=1.0,
                 integrator="leapfrog"):
    """Public fused-transition entry (docs on :func:`_step_inner`)."""
    unit = isinstance(prior_prec, (int, float)) and float(prior_prec) == 1.0
    return _step_inner(
        XT, Y, theta, grad, lp, m0, logu, eps, n_leaps=n_leaps,
        block_chains=block_chains, interpret=interpret, mxu_dtype=mxu_dtype,
        kind=kind, weights=weights, offsets=offsets, prior_prec=prior_prec,
        _use_w=weights is not None, _use_o=offsets is not None,
        _unit_prior=unit, _vec_prior=is_vec_prior(prior_prec),
        _mat_prior=is_mat_prior(prior_prec),
        integrator=integrator,
    )


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
