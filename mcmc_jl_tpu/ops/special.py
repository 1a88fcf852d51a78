"""Kernel-safe special functions (Mosaic-lowerable).

Mosaic (the Pallas TPU compiler) has no lowering for ``erf``/``erfc``/
``lgamma``, so ``jax.scipy.special.log_ndtr`` — which the probit GLM link
needs on every observation of every leapfrog — cannot run inside a Pallas
kernel.  This module provides ``log_ndtr`` built ONLY from primitives Mosaic
lowers (exp/log/select/arithmetic):

* mid/upper range (z >= -2): Abramowitz & Stegun 7.1.26 rational-exp
  approximation of erf (|abs err| <= 1.5e-7), then ``log``;
* lower tail (z < -2): Mills-ratio continued fraction,
  ``Phi(-x) = phi(x) / (x + 1/(x + 2/(x + 3/(...))))``, evaluated bottom-up
  at fixed depth — log-space, so it is exact-shape down to z = -38 where
  f32 ``Phi`` underflows.

Accuracy (measured in tests/test_special.py against jax.scipy in f64):
|log_ndtr_tpu - log_ndtr| < 4e-6 absolute over z in [-38, 8], which is at
the level of f32 roundoff in the downstream sum over observations.

Used by the probit link in :mod:`.pallas_glm` (inside kernels) — the XLA
paths keep ``jax.scipy.special.log_ndtr``.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)
_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)

# A&S 7.1.26 coefficients: erf(x) ~= 1 - poly(t) exp(-x^2), t = 1/(1 + p x)
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)

#: continued-fraction depth for the lower tail.  At the switch point
#: (x = 2) depth 60 converges |log err| < 2e-7; deeper tails converge much
#: faster (error falls like the CF level over x^2).
_CF_DEPTH = 60


def _erf_as(x):
    """A&S 7.1.26 erf for x >= 0 (abs error <= 1.5e-7)."""
    t = 1.0 / (1.0 + _AS_P * x)
    poly = t * (_AS_A[0] + t * (_AS_A[1] + t * (
        _AS_A[2] + t * (_AS_A[3] + t * _AS_A[4]))))
    return 1.0 - poly * jnp.exp(-x * x)


def _log_mills_denom(x):
    """log D(x) where Phi(-x) = phi(x)/D(x), D = x + 1/(x + 2/(x + ...)).

    Bottom-up fixed-depth evaluation; valid for x > 0 (we call it with
    x >= 2 where _CF_DEPTH converges to f32 accuracy)."""
    d = x
    for k in range(_CF_DEPTH, 0, -1):
        d = x + k / d
    return jnp.log(d)


def log_ndtr(z):
    """Mosaic-lowerable ``log(Phi(z))`` (see module docstring).

    Elementwise; f32-accuracy (abs err < 4e-6).  Both branches are
    evaluated on safe inputs (double-where), so gradients stay finite
    everywhere.
    """
    z = jnp.asarray(z)
    tail = z < -2.0
    # tail branch: log phi(x) - log D(x) at x = -z >= 2
    x = jnp.where(tail, -z, 2.0)
    log_tail = -0.5 * x * x - _LOG_SQRT_2PI - _log_mills_denom(x)
    # mid branch: Phi(z) = (1 + erf(z/sqrt2))/2, reflected so erf sees >= 0
    u = jnp.where(tail, 0.0, z) / _SQRT2
    e = _erf_as(jnp.abs(u))
    phi_mid = 0.5 * jnp.where(u >= 0, 1.0 + e, 1.0 - e)
    log_mid = jnp.log(phi_mid)
    return jnp.where(tail, log_tail, log_mid)


def ndtr(z):
    """Mosaic-lowerable ``Phi(z)``."""
    return jnp.exp(log_ndtr(z))
