"""ITU-R P.2040-3 complex permittivity and Fresnel reflection coefficients.

Capability parity with the reference material precompute and reflection math
(``/root/reference/src/compute_paths.c:125-206`` and ``:289-344``), redesigned
as pure, differentiable JAX functions over dense per-material arrays:

* :func:`precompute_eta` — per-material complex relative permittivity
  ``eta = eps' - j * 17.98 sigma / f_GHz`` and its cached derived quantities
  (sqrt, inverse, magnitudes), matching eqs. (12)/(28)-(29) as implemented at
  /root/reference/src/compute_paths.c:184-204 (including the reference's
  ``1/0.0556325`` constant for 17.98).
* :func:`refl_coefs` — complex TE/TM reflection coefficients per eqs.
  (31a)/(31b), including the reference's elementwise approximation of eq. (33)
  for ``cos(theta_2)`` (/root/reference/src/compute_paths.c:318-320; the
  real/imag parts are square-rooted independently — NOT a complex sqrt — and
  parity requires keeping that), the total-internal-reflection guard, and the
  ``r = 1 - s`` reflection-reduction factor.

All branches are expressed as ``jnp.where`` with NaN-safe operands so that
gradients w.r.t. the material coefficients (a, b, c, d, s) are finite.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..materials import MaterialTable

__all__ = ["EtaPrecomputed", "precompute_eta", "refl_coefs", "trans_coefs",
           "complex_sqrt"]

_FLT_EPS = 1.1920928955078125e-07  # __FLT_EPSILON__


def _safe_sqrt(x):
    """sqrt with zero (sub)gradient at x<=0 instead of NaN/inf."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), 0.0)


def complex_sqrt(re, im, mag):
    """Principal complex sqrt from (re, im, |z|), mirroring the reference
    ``csqrtf`` (/root/reference/src/compute_paths.c:136-151): real part
    ``sqrt((re+|z|)/2)``; imaginary part 0 when ``|im| < eps`` and
    ``re >= -eps``, else ``sign(im) * sqrt((|z|-re)/2)``."""
    s_re = _safe_sqrt((re + mag) * 0.5)
    zero_im = (jnp.abs(im) < _FLT_EPS) & (re >= -_FLT_EPS)
    s_im_mag = _safe_sqrt((mag - re) * 0.5)
    s_im = jnp.where(zero_im, 0.0, jnp.where(im < 0, -s_im_mag, s_im_mag))
    return s_re, s_im


def _cdiv(a_re, a_im, b_re, b_im):
    """Complex division (a/b) as in /root/reference/src/compute_paths.c:152-164."""
    den = b_re * b_re + b_im * b_im
    safe_den = jnp.where(den > 0, den, 1.0)
    c_re = (a_re * b_re + a_im * b_im) / safe_den
    c_im = (a_im * b_re - a_re * b_im) / safe_den
    return jnp.where(den > 0, c_re, 0.0), jnp.where(den > 0, c_im, 0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EtaPrecomputed:
    """Per-material eta caches (arrays of shape [M]), the JAX analogue of the
    reference ``MaterialPrecomputed`` global (/root/reference/src/compute_paths.c:125-132)."""

    eta_re: jax.Array
    eta_im: jax.Array
    eta_abs: jax.Array
    eta_abs_pow2: jax.Array
    eta_abs_inv_sqrt: jax.Array
    eta_sqrt_re: jax.Array
    eta_sqrt_im: jax.Array
    eta_inv_re: jax.Array
    eta_inv_im: jax.Array
    r: jax.Array  # reflection reduction factor 1 - s
    s: jax.Array
    s1_alpha: jax.Array

    def gather(self, material_idx) -> "EtaPrecomputed":
        """Per-hit rows (material_idx i32[...] -> leaves of that shape)."""
        return jax.tree.map(lambda x: x[material_idx], self)


def precompute_eta(materials: MaterialTable, carrier_frequency_ghz) -> EtaPrecomputed:
    """Complex relative permittivity per material at ``f`` GHz.

    ``eta_re = a * f**b``; ``eta_im = (c * f**d) / (0.0556325027 * f)``
    (= 17.98 sigma / f, ITU-R P.2040 eq. 12), exactly as
    /root/reference/src/compute_paths.c:184-187.  Differentiable w.r.t. all
    material coefficients and the carrier frequency.
    """
    f = jnp.asarray(carrier_frequency_ghz, jnp.float32)
    eta_re = materials.a * jnp.power(f, materials.b)
    eta_im = (materials.c * jnp.power(f, materials.d)) / (
        jnp.float32(0.0556325027352135) * f)
    eta_abs_pow2 = eta_re * eta_re + eta_im * eta_im
    eta_abs = _safe_sqrt(eta_abs_pow2)
    eta_abs_inv_sqrt = 1.0 / _safe_sqrt(eta_abs)
    eta_sqrt_re, eta_sqrt_im = complex_sqrt(eta_re, eta_im, eta_abs)
    eta_inv_re = eta_re / eta_abs_pow2
    eta_inv_im = -eta_im / eta_abs_pow2
    return EtaPrecomputed(
        eta_re=eta_re, eta_im=eta_im, eta_abs=eta_abs,
        eta_abs_pow2=eta_abs_pow2, eta_abs_inv_sqrt=eta_abs_inv_sqrt,
        eta_sqrt_re=eta_sqrt_re, eta_sqrt_im=eta_sqrt_im,
        eta_inv_re=eta_inv_re, eta_inv_im=eta_inv_im,
        r=1.0 - materials.s, s=materials.s, s1_alpha=materials.s1_alpha,
    )


def refl_coefs(eta: EtaPrecomputed, cos_t1, sin_t1) -> Tuple[
        jax.Array, jax.Array, jax.Array, jax.Array]:
    """Complex (R_TE, R_TM) for per-hit eta rows and incidence angles.

    Vectorised port of /root/reference/src/compute_paths.c:300-344: ITU-R
    P.2040-3 eqs. (31a)/(31b) with the reference's per-component eq.-33
    approximation for cos(theta_2) and the TIR guard
    ``sin(theta_1)/sqrt(|eta|) > 1 - eps -> R = 1``.

    Takes ``cos(theta_1)``/``sin(theta_1)`` directly (the tracer derives them
    algebraically from the incidence dot product — no trig round-trip; the C
    code's ``sinf(acos(n.d))`` chain equals ``sqrt(1-(n.d)^2)`` to f32
    rounding).  Returns ``(r_te_re, r_te_im, r_tm_re, r_tm_im)`` with the
    ``1 - s`` reduction applied.
    """
    tir = eta.eta_abs_inv_sqrt * sin_t1 > 1.0 - _FLT_EPS

    sin2 = sin_t1 * sin_t1
    # eq. 33, reference's elementwise (non-complex) sqrt approximation.
    cos_t2_re = _safe_sqrt(1.0 + eta.eta_inv_re / eta.eta_abs_pow2 * sin2)
    cos_t2_im = _safe_sqrt(1.0 - eta.eta_inv_im / eta.eta_abs_pow2 * sin2)

    # R_TE, eq. 31a: (cos t1 - sqrt(eta) cos t2) / (cos t1 + sqrt(eta) cos t2)
    sec_re = eta.eta_sqrt_re * cos_t2_re - eta.eta_sqrt_im * cos_t2_im
    sec_im = eta.eta_sqrt_re * cos_t2_im + eta.eta_sqrt_im * cos_t2_re
    r_te_re, r_te_im = _cdiv(cos_t1 - sec_re, -sec_im, cos_t1 + sec_re, sec_im)

    # R_TM, eq. 31b: (sqrt(eta) cos t1 - cos t2) / (sqrt(eta) cos t1 + cos t2)
    sc1_re = eta.eta_sqrt_re * cos_t1
    sc1_im = eta.eta_sqrt_im * cos_t1
    r_tm_re, r_tm_im = _cdiv(sc1_re - cos_t2_re, sc1_im - cos_t2_im,
                             sc1_re + cos_t2_re, sc1_im + cos_t2_im)

    r_te_re = jnp.where(tir, 1.0, r_te_re * eta.r)
    r_te_im = jnp.where(tir, 0.0, r_te_im * eta.r)
    r_tm_re = jnp.where(tir, 1.0, r_tm_re * eta.r)
    r_tm_im = jnp.where(tir, 0.0, r_tm_im * eta.r)
    return r_te_re, r_te_im, r_tm_re, r_tm_im


def trans_coefs(eta: EtaPrecomputed, cos_t1, sin_t1) -> Tuple[
        jax.Array, jax.Array, jax.Array, jax.Array]:
    """Complex (T_TE, T_TM) transmission coefficients, ITU-R P.2040-3 eqs.
    (31c)/(31d):

        T_eTE = 2 cos(t1) / (cos(t1) + sqrt(eta) cos(t2))
        T_eTM = 2 sqrt(eta) cos(t1) / (sqrt(eta) cos(t1) + cos(t2))

    with the same per-component eq.-33 approximation for cos(t2) as
    :func:`refl_coefs` (consistency with the reflection math).  This is the
    extension the reference left as TODO
    (/root/reference/src/compute_paths.c:725-728); it powers the tracer's
    "occlusion with penetration loss" mode.  Under total internal reflection
    T = 0.  Returns ``(t_te_re, t_te_im, t_tm_re, t_tm_im)``.
    """
    tir = eta.eta_abs_inv_sqrt * sin_t1 > 1.0 - _FLT_EPS

    sin2 = sin_t1 * sin_t1
    cos_t2_re = _safe_sqrt(1.0 + eta.eta_inv_re / eta.eta_abs_pow2 * sin2)
    cos_t2_im = _safe_sqrt(1.0 - eta.eta_inv_im / eta.eta_abs_pow2 * sin2)

    # sqrt(eta) * cos(t2)
    sec_re = eta.eta_sqrt_re * cos_t2_re - eta.eta_sqrt_im * cos_t2_im
    sec_im = eta.eta_sqrt_re * cos_t2_im + eta.eta_sqrt_im * cos_t2_re
    t_te_re, t_te_im = _cdiv(2.0 * cos_t1, jnp.zeros_like(cos_t1),
                             cos_t1 + sec_re, sec_im)

    # sqrt(eta) * cos(t1)
    sc1_re = eta.eta_sqrt_re * cos_t1
    sc1_im = eta.eta_sqrt_im * cos_t1
    t_tm_re, t_tm_im = _cdiv(2.0 * sc1_re, 2.0 * sc1_im,
                             sc1_re + cos_t2_re, sc1_im + cos_t2_im)

    zero = jnp.zeros_like(cos_t1)
    t_te_re = jnp.where(tir, zero, t_te_re)
    t_te_im = jnp.where(tir, zero, t_te_im)
    t_tm_re = jnp.where(tir, zero, t_tm_re)
    t_tm_im = jnp.where(tir, zero, t_tm_im)
    return t_te_re, t_te_im, t_tm_re, t_tm_im
