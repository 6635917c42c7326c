"""Fully-fused bounce megakernels: the per-bounce elementwise pipeline as two
Pallas passes with Pallas backwards.

Round-3 profiling (benchmarks/logs/trace_r3o) showed the non-kernel device
wall (17.7 of 29.6 ms at 1M rays) dominated by ~100 XLA loop fusions each
round-tripping 40-170 MiB of HBM: the scatter/shadow elementwise cluster,
the hit-payload fetches, and their backwards.  The reference does all of
this inline per ray (/root/reference/src/compute_paths.c:607-723); the
TPU-native answer is to fuse each bounce's elementwise work into two VPU
kernels around the shadow-ray query:

* :func:`bounce_pre` — everything between the bounce nearest-hit query and
  the shadow query: in-kernel hit-payload fetch (exact bf16-limb one-hot
  matmul — the payload row never touches HBM), the full reflection-half
  shading chain (hit-distance recompute, ITU Fresnel, complex amplitude
  update, specular step, Doppler — the ops of
  :func:`hermespy_rt_tpu.ops.shade.shade_a_jnp` in the same order), and the
  per-RX shadow-ray setup (directions, distances, self-plane crossing).
  Emits the shadow queries' ``od`` row operands directly in the layout the
  intersection kernel consumes.
* :func:`bounce_post` — everything after the shadow query: the self-hit
  merge and occlusion decisions, the reference θ-clobber chain
  (parity="reference", /root/reference/src/compute_paths.c:682 — the
  occluder normals are fetched IN-KERNEL), directive scattering
  coefficients, complex amplitude outputs, delay/Doppler rows.

Differentiation: each stage is a ``jax.custom_vjp`` whose backward is ITS
OWN Pallas kernel — the body recomputes the forward chain from the saved
inputs entirely in VMEM via ``jax.vjp`` of the same tile function, so the
backward costs one HBM read of inputs + cotangents and one write of input
cotangents (the r3 fused-shade experiment lost because its jnp-vjp backward
recomputed the chain through XLA/HBM; see benchmarks/README.md negative
results).  Gradients w.r.t. the fused payload table accumulate in-kernel
across ray tiles as an exact HIGHEST one-hot contraction (the fetch
backward), so the standalone fetch-backward matmuls disappear too.

Layout: every operand keeps rays on LANES ([k, R] rows, 4096-ray tiles);
the carry between bounces is the intersection kernel's own ``od`` row
operand ([8, R]: d rows, o rows, zero pad), so no transposes appear
anywhere in the bounce loop.

Semantics match the jnp path to 1-2 ulp (same formulas, same op order, same
helper functions — Mosaic contracts mul+add chains into fma where XLA's
fusion boundaries keep them separate, so individual f32 roundings differ;
tests/test_bounce_fused.py asserts 3e-5 rtol and identical decision masks);
both parity modes are supported.  Not supported (the tracer falls back to
jnp, with a one-time warning): ``transmission``, ``spawn_transmission``,
tri-sharded scene access, tables beyond 2048 padded rows.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fresnel import EtaPrecomputed, refl_coefs
from .geometry import fast_acos
from .intersect import FLT_EPS
from .scattering import scat_coefs
from .shade import ETA_FIELDS, _cross3r, _dot3r

__all__ = ["FusedSpec", "bounce_pre", "bounce_post", "od_rows_from_vectors",
           "fused_loop_slim"]

SPEED_OF_LIGHT = np.float32(299792458.0)
_CLIP = np.float32(1.0) - np.float32(FLT_EPS)
_GEOM = 15  # geometry columns before the eta block in the fused table


@dataclasses.dataclass(frozen=True)
class FusedSpec:
    """Static configuration of the fused bounce kernels (hashable)."""

    nrx: int
    parity: str = "reference"          # "reference" | "physical"
    grad_geometry: bool = True
    # False = positions/launch geometry/carrier scalars are compile-time
    # constants of the backward: the tile functions stop-grad the ray
    # operand, RX positions and fslm/k_dop, so the in-kernel vjp prunes the
    # entire geometric cotangent chain AT TRACE TIME — the static form of
    # the DCE XLA performs for a materials-only jax.grad.  Requires
    # grad_geometry=False.  Measured: the monolithic backward kernels
    # cannot be DCE'd from outside (probe_r4a: 4.1 + 3.7 ms per bounce with
    # the full geometric backward vs ~1 ms forward), so the pruning must be
    # explicit.
    grad_positions: bool = True
    eps_o: float = 1e-4                # physical-mode occlusion offset
    interpret: bool = False
    block: int = 4096                  # rays per kernel tile

    def __post_init__(self):
        # The slim backward re-evaluates only the Fresnel/scattering chain;
        # that transpose is complete ONLY when geometry carries no cotangent.
        # TracerConfig enforces the same pairing, but this ops-level API must
        # not be able to produce silently wrong gradients on its own.
        if not self.grad_positions and self.grad_geometry:
            raise ValueError(
                "FusedSpec(grad_positions=False) requires grad_geometry="
                "False: the slim backward drops geometry cotangents "
                "(tau/Doppler/hit-distance chains) by construction")


def _round_up(x, m):
    return -(-x // m) * m


# Whole-loop slim backward ray-tile size (see _fused_loop_bwd_slim).
_LOOP_BWD_BLOCK = 2048
# Pad the per-material eta table to this many rows inside the slim backward
# (0 = no padding).  Probe knob (probe_r5k): isolates whether tiny-table
# one-hot contractions lower poorly in Mosaic.
_MAT_ROWS_PAD = 0

# PROBE-ONLY ablation switch (benchmarks/probe_r5d.py): entries in this set
# cut pieces out of the slim backward kernels to attribute their device
# time.  Semantics are wrong under any non-empty value — never set outside
# a perf probe.  Recognized: "novjp", "noscatter", "stepped_acc".
_ABLATE = frozenset()


def od_rows_from_vectors(o, d):
    """[R, 3] o/d -> the intersect kernel's [8, R] od rows (d, o, zeros)."""
    R = o.shape[0]
    return jnp.concatenate(
        [d.T, o.T, jnp.zeros((2, R), jnp.float32)], axis=0)


# ---------------------------------------------------------------------------
# in-kernel exact payload fetch (the pallas_onehot_fetch contraction inline)

def _oht_bf16(idx_row, t):
    """[T, B] bf16 one-hot from a [1, B] clamped index row (a sublane iota
    compare — exact: 0/1 are bf16-representable).  Built ONCE per fetch or
    scatter-add: the limb structure lives on the OTHER (row) operand axis,
    so the VPU compare/convert work is 1/3 of the first design's stacked
    [3T, B] iota."""
    b = idx_row.shape[-1]
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (t, b), 0)
    return (idx_row == iota_t).astype(jnp.bfloat16)


def _fetch_rows_oht(limbs, oht):
    """``table[idx]`` rows [C, B] from the [3C, T] bf16 limb table and an
    already-built one-hot — one exact native-bf16 MXU pass (ops/fetch.py)."""
    y = jnp.dot(limbs, oht, preferred_element_type=jnp.float32)  # [3C, B]
    c = limbs.shape[0] // 3
    return y[0:c] + y[c:2 * c] + y[2 * c:]


def _fetch_rows(limbs, idx_row, t):
    """``table[idx]`` rows [C, B] from the [3C, T] bf16 limb table (limb
    groups stacked on ROWS) and a [1, B] clamped index row — one exact
    native-bf16 MXU pass per limb structure: each [3C, B] output element is
    a single ``1.0 * limb`` product accumulated in f32; summing the three
    C-row groups reconstructs the f32 row bit-exactly (ops/fetch.py)."""
    return _fetch_rows_oht(limbs, _oht_bf16(idx_row, t))


def _split3_kernel(x):
    """In-kernel 3-limb bf16 split (no barriers needed under Mosaic —
    validated in ops/fetch_pallas.py)."""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def _scatter_add_oht(oht, d_payload):
    """Per-tile table cotangent in ONE native-bf16 MXU pass: the cotangent
    rows split exactly into three bf16 limbs (stacked on rows), the one-hot
    is single-limb, so every product is exact and accumulates in f32 —
    the same limb-group trick as the forward fetch, 6x less MXU work than
    the HIGHEST f32 form (which measured ~1 ms per backward kernel,
    probe_r4b).  Returns [T, 3C]; the CALLER sums the three C-column groups
    (in XLA — a lane-axis slice at a non-128 offset would relayout
    in-kernel)."""
    g_limbs = jnp.concatenate(_split3_kernel(d_payload), axis=0)  # [3C, B]
    return jax.lax.dot_general(
        oht, g_limbs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [T, 3C]


def _scatter_add_oht_swapped(oht, d_payload):
    """Same contraction with the operands swapped and the (tiny) [3C, T]
    output transposed — probes whether Mosaic's lane-lane dot_general picks
    a cheaper operand relayout when the one-hot is the RHS (probe_r5n)."""
    g_limbs = jnp.concatenate(_split3_kernel(d_payload), axis=0)  # [3C, B]
    y = jax.lax.dot_general(
        g_limbs, oht, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [3C, T]
    return y.T


def _scatter_add_tile(idx_row, d_payload, t):
    return _scatter_add_oht(_oht_bf16(idx_row, t), d_payload)


def _sum_limb_groups(y3):
    """[T, 3C] f32 -> [T, C] exact limb-group reconstruction (XLA side)."""
    c = y3.shape[-1] // 3
    return y3[:, 0:c] + y3[:, c:2 * c] + y3[:, 2 * c:]


def _eta_rows(payload):
    return EtaPrecomputed(**{f: payload[_GEOM + i]
                             for i, f in enumerate(ETA_FIELDS)})


# ---------------------------------------------------------------------------
# stage 1 tile function (differentiable part)

def _safe_norm_r(v):
    """Row-layout twin of tracer._safe_norm ([3, B] -> [1, B])."""
    n2 = _dot3r(v, v)
    n = jnp.sqrt(jnp.where(n2 > 0, n2, 1.0))
    return jnp.where(n2 > 0, n, 0.0)


def _pre_diff(payload, od, st, rxp, fslm, k_dop, *, live, spec: FusedSpec):
    """Differentiable core of the pre-query stage, row layout [k, B].

    Returns ``(od2, st2, ex, sh, d2rx, dsn, dint)`` — the new ray operand
    rows, the new amplitude/delay/Doppler state, the (theta, cos_t1, ndot)
    extras, the per-RX shadow-query operands ``sh`` ([nrx*8, B]: ds rows,
    stop-gradded query origins, zeros), shadow distances, and the two dot
    products the non-differentiable self-hit decisions derive from.

    Exactly the op sequence of :func:`...ops.shade.shade_a_jnp` followed by
    the scatter-pre lines of ``tracer.bounce_step``
    (/root/reference/src/compute_paths.c:607-664 and :666-680), one op at a
    time, so forward values are bit-identical to the jnp path.
    """
    if not spec.grad_positions:
        # stop_gradient is identity forward; the vjp of everything that
        # only feeds these chains dissolves at trace time (see FusedSpec)
        od = jax.lax.stop_gradient(od)
        rxp = jax.lax.stop_gradient(rxp)
        fslm = jax.lax.stop_gradient(fslm)
        k_dop = jax.lax.stop_gradient(k_dop)
    d = od[0:3]
    o = od[3:6]
    geo = payload[0:_GEOM]
    if not spec.grad_geometry:
        geo = jax.lax.stop_gradient(geo)
    v0, e1, e2 = geo[0:3], geo[3:6], geo[6:9]
    n, vel = geo[9:12], geo[12:15]
    eta = _eta_rows(payload)

    pvec = _cross3r(d, e2)
    det = _dot3r(e1, pvec)
    qvec = _cross3r(o - v0, e1)
    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    t = jnp.where(live, _dot3r(e2, qvec) * inv_det, 0.0)

    ndot = _dot3r(n, d)
    cos_t1 = jnp.clip(jnp.abs(ndot), 0.0, _CLIP)
    sin_t1 = jnp.sqrt(1.0 - cos_t1 * cos_t1)
    theta = fast_acos(cos_t1)

    r_te_re, r_te_im, r_tm_re, r_tm_im = refl_coefs(eta, cos_t1, sin_t1)
    fsl2 = (fslm * t) ** 2
    fscale = jnp.where(fsl2 > 1.0, 1.0 / jnp.where(fsl2 > 1.0, fsl2, 1.0),
                       1.0)
    r_te_re, r_te_im = r_te_re * fscale, r_te_im * fscale
    r_tm_re, r_tm_im = r_tm_re * fscale, r_tm_im * fscale

    ate_re, ate_im = st[0:1], st[1:2]
    atm_re, atm_im = st[2:3], st[3:4]
    new_ate_re = ate_re * r_te_re - ate_im * r_te_im
    new_ate_im = ate_re * r_te_im + ate_im * r_te_re
    new_atm_re = atm_re * r_tm_re - atm_im * r_tm_im
    new_atm_im = atm_re * r_tm_im + atm_im * r_tm_re

    hitp = o + t * d
    d_ref = d - 2.0 * _dot3r(d, n) * n
    o_ref = hitp + jnp.float32(1e-4) * d_ref
    o2 = jnp.where(live, o_ref, o)
    d2 = jnp.where(live, d_ref, d)

    st2 = jnp.concatenate([
        jnp.where(live, new_ate_re, ate_re),
        jnp.where(live, new_ate_im, ate_im),
        jnp.where(live, new_atm_re, atm_re),
        jnp.where(live, new_atm_im, atm_im),
        st[4:5] + jnp.where(live, t / SPEED_OF_LIGHT, 0.0),
        st[5:6] + jnp.where(live, _dot3r(d_ref - d, vel) * k_dop, 0.0),
    ], axis=0)
    od2 = jnp.concatenate([d2, o2, jnp.zeros_like(od[6:8])], axis=0)
    ex = jnp.concatenate([theta, cos_t1, ndot], axis=0)

    # --- per-RX shadow-ray setup (tracer.bounce_step scatter-pre lines) ---
    sh_rows, d2rx_rows, dsn_rows = [], [], []
    zeros2 = jnp.zeros_like(od[6:8])
    dint = _dot3r(d2, n)                        # post-interaction d . n
    for k in range(spec.nrx):
        ds_un = jnp.concatenate([rxp[k, 0] - o2[0:1],
                                 rxp[k, 1] - o2[1:2],
                                 rxp[k, 2] - o2[2:3]], axis=0)  # [3, B]
        d2rx = _safe_norm_r(ds_un)
        ds = ds_un / jnp.where(d2rx > 0, d2rx, 1.0)
        dsn_rows.append(_dot3r(ds, n))
        if spec.parity == "reference":
            so_q = jax.lax.stop_gradient(o2)
        else:
            so_q = jax.lax.stop_gradient(
                o2 + jnp.float32(spec.eps_o) * ds)
        sh_rows.append(jnp.concatenate([ds, so_q, zeros2], axis=0))
        d2rx_rows.append(d2rx)
    sh = jnp.concatenate(sh_rows, axis=0)       # [nrx*8, B]
    d2rx_s = jnp.concatenate(d2rx_rows, axis=0)  # [nrx, B]
    dsn = jnp.concatenate(dsn_rows, axis=0)      # [nrx, B]
    # backward residuals for the slim (grad_positions=False) path: the
    # incidence trig + free-space factor at which _pre_light re-evaluates
    # the Fresnel chain — saved so the backward recomputes nothing else
    res = jax.lax.stop_gradient(
        jnp.concatenate([cos_t1, sin_t1, fscale], axis=0))      # [3, B]
    return od2, st2, ex, sh, d2rx_s, dsn, dint, res


def _pre_nondiff(dsn, dint, idx, live, spec: FusedSpec):
    """Self-plane crossing decisions (stop-gradded in the jnp path too):
    t_self = -1e-4 (d.n) / (ds.n); crossing = opposite-side test."""
    t_self = -jnp.float32(1e-4) * dint / jnp.where(dsn == 0.0, 1.0, dsn)
    crossing = ((dsn * dint < 0.0) & live).astype(jnp.int32)
    excl = jnp.where(live, idx, -1)
    return t_self, crossing, excl


# ---------------------------------------------------------------------------
# stage 1 kernels

def _read_rxp(rxp_ref, nrx):
    """[nrx, 3] jnp array from SMEM scalar reads (a vjp-able input value)."""
    return jnp.stack([jnp.stack([rxp_ref[k, c] for c in range(3)])
                      for k in range(nrx)])


def _pre_fwd_kernel(sc_ref, rxp_ref, limbs_ref, od_ref, st_ref, act_ref,
                    idx_ref, *out_refs, spec: FusedSpec, t: int,
                    with_mat: bool = False):
    if with_mat:
        # matrow_ref rides as the last INPUT when the caller wants the hit
        # material id emitted (fused_loop_slim: the XLA-side
        # material[max(excl, 0)] gather lowered as a 10 ms scalar-memory
        # fusion per bounce, probe_r5k/trace_r5k — here it is one exact
        # [1, T] @ [T, B] pass on the one-hot this kernel builds anyway)
        matrow_ref = out_refs[0]
        out_refs = out_refs[1:]
        (od2_ref, st2_ref, ex_ref, sh_ref, d2rx_ref, tself_ref, cross_ref,
         excl_ref, live_ref, res_ref, mat_ref) = out_refs
    else:
        (od2_ref, st2_ref, ex_ref, sh_ref, d2rx_ref, tself_ref, cross_ref,
         excl_ref, live_ref, res_ref) = out_refs
    fslm = sc_ref[0]
    k_dop = sc_ref[1]
    rxp = _read_rxp(rxp_ref, spec.nrx)
    idx = idx_ref[...]
    act = act_ref[...] != 0
    live = act & (idx >= 0)
    safe = jnp.maximum(idx, 0)
    oht = _oht_bf16(safe, t)
    payload = _fetch_rows_oht(limbs_ref[...], oht)
    if with_mat:
        # material ids <= 255 are bf16-exact; one-hot selection is exact
        mat_ref[...] = jnp.dot(matrow_ref[...], oht,
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32)

    od2, st2, ex, sh, d2rx, dsn, dint, res = _pre_diff(
        payload, od_ref[...], st_ref[...], rxp, fslm, k_dop,
        live=live, spec=spec)
    t_self, crossing, excl = _pre_nondiff(dsn, dint, idx, live, spec)

    res_ref[...] = res
    od2_ref[...] = od2
    st2_ref[...] = st2
    ex_ref[...] = ex
    sh_ref[...] = sh
    d2rx_ref[...] = d2rx
    tself_ref[...] = t_self
    cross_ref[...] = crossing
    excl_ref[...] = excl
    live_ref[...] = live.astype(jnp.int32)


def _acc_pad(x, rows, lanes=128):
    """Pad a small [r, c] grad to an accumulator block [rows, lanes]."""
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, lanes - x.shape[1])))


def _pre_light(eta_rows, st, *, live, cos_t1, sin_t1, fscale):
    """Light backward core for the slim (grad_positions=False) path: the
    ONLY part of the pre-stage whose cotangents survive — ITU Fresnel at
    the SAVED incidence residuals, the complex amplitude update, and the
    identity tau/freq carries (additive constants dropped: they do not
    change the transpose).  ``eta_rows`` is the [12, B] eta block alone:
    the geometry columns carry no cotangent here (grad_geometry=False is
    asserted by FusedSpec), so the slim backward never fetches or
    scatter-adds them — 27 -> 12 payload columns (VERDICT r4 item 2)."""
    eta = EtaPrecomputed(**{f: eta_rows[i]
                            for i, f in enumerate(ETA_FIELDS)})
    r_te_re, r_te_im, r_tm_re, r_tm_im = refl_coefs(eta, cos_t1, sin_t1)
    r_te_re, r_te_im = r_te_re * fscale, r_te_im * fscale
    r_tm_re, r_tm_im = r_tm_re * fscale, r_tm_im * fscale
    ate_re, ate_im = st[0:1], st[1:2]
    atm_re, atm_im = st[2:3], st[3:4]
    new_ate_re = ate_re * r_te_re - ate_im * r_te_im
    new_ate_im = ate_re * r_te_im + ate_im * r_te_re
    new_atm_re = atm_re * r_tm_re - atm_im * r_tm_im
    new_atm_im = atm_re * r_tm_im + atm_im * r_tm_re
    return jnp.concatenate([
        jnp.where(live, new_ate_re, ate_re),
        jnp.where(live, new_ate_im, ate_im),
        jnp.where(live, new_atm_re, atm_re),
        jnp.where(live, new_atm_im, atm_im),
        st[4:5], st[5:6],
    ], axis=0)


def _pre_bwd_slim_kernel(limbse_ref, st_ref, act_ref, idx_ref, res_ref,
                         dst2_ref, dst_ref, dtab_ref, *, spec: FusedSpec,
                         t: int):
    """Slim pre backward: vjp of :func:`_pre_light` at the saved residual
    rows (res = cos_t1, sin_t1, fscale) — no geometric recompute at all.
    ``limbse_ref`` is the eta-block limb table [36, T] (12 columns, not
    27); the one-hot is built ONCE and shared between the fetch and the
    scatter-add contraction."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    idx = idx_ref[...]
    act = act_ref[...] != 0
    live = act & (idx >= 0)
    safe = jnp.maximum(idx, 0)
    oht = _oht_bf16(safe, t)
    eta_rows = _fetch_rows_oht(limbse_ref[...], oht)            # [12, B]
    res = res_ref[...]
    if "novjp" in _ABLATE:                     # probe-only attribution
        d_eta, d_st = eta_rows, dst2_ref[...]
    else:
        f = functools.partial(_pre_light, live=live, cos_t1=res[0:1],
                              sin_t1=res[1:2], fscale=res[2:3])
        _, vjpfn = jax.vjp(f, eta_rows, st_ref[...])
        d_eta, d_st = vjpfn(dst2_ref[...])
    dst_ref[...] = d_st
    if "stepped_acc" in _ABLATE:
        dtab_ref[...] = _scatter_add_oht(oht, d_eta)[None]
    elif "noscatter" not in _ABLATE:
        dtab_ref[...] += _scatter_add_oht(oht, d_eta)           # [T, 36]


def _pre_bwd_kernel(sc_ref, rxp_ref, limbs_ref, od_ref, st_ref, act_ref,
                    idx_ref, *refs, spec: FusedSpec, t: int):
    nrx = spec.nrx
    (dod2_ref, dst2_ref, dex_ref, dsh_ref, dd2rx_ref,
     dod_ref, dst_ref, dtab_ref, drxp_ref, dsc_ref) = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)
        drxp_ref[...] = jnp.zeros_like(drxp_ref)
        dsc_ref[...] = jnp.zeros_like(dsc_ref)

    fslm = sc_ref[0]
    k_dop = sc_ref[1]
    rxp = _read_rxp(rxp_ref, nrx)
    idx = idx_ref[...]
    act = act_ref[...] != 0
    live = act & (idx >= 0)
    safe = jnp.maximum(idx, 0)
    oht = _oht_bf16(safe, t)          # shared: fetch + scatter contraction
    payload = _fetch_rows_oht(limbs_ref[...], oht)

    f = functools.partial(_pre_diff, live=live, spec=spec)
    _, vjpfn = jax.vjp(f, payload, od_ref[...], st_ref[...], rxp, fslm,
                       k_dop)
    zrow = lambda k: jnp.zeros((k,) + idx.shape[1:], jnp.float32)
    d_payload, d_od, d_st, d_rxp, d_fslm, d_kdop = vjpfn(
        (dod2_ref[...], dst2_ref[...], dex_ref[...],
         dsh_ref[...], dd2rx_ref[...], zrow(nrx), zrow(1), zrow(3)))

    dst_ref[...] = d_st
    dtab_ref[...] += _scatter_add_oht(oht, d_payload)
    dod_ref[...] = d_od
    drxp_ref[...] += _acc_pad(d_rxp, drxp_ref.shape[0])
    lane = jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 0)
    dsc_ref[...] += jnp.where(
        (row == 0) & (lane == 0), d_fslm,
        jnp.where((row == 0) & (lane == 1), d_kdop, 0.0))


# ---------------------------------------------------------------------------
# stage 2 tile function

def _post_decisions(t_o, idx_o, t_self, crossing, excl, d2rx, live_b,
                    spec: FusedSpec):
    """Self-hit merge + occlusion decisions (all non-differentiable), the
    exact comparisons of tracer.bounce_step
    (/root/reference/src/compute_paths.c:678-683 for the 1-metre parity
    window)."""
    crossing_b = crossing != 0
    if spec.parity == "reference":
        self_hit = crossing_b & (t_self > jnp.float32(FLT_EPS))
        closer = self_hit & (t_self < t_o)
        t_m = jnp.where(closer, t_self, t_o)
        idx_m = jnp.where(closer, excl, idx_o)
        blocked = (idx_m >= 0) & (t_m <= 1.0)
    else:
        eps_o = jnp.float32(spec.eps_o)
        limit = d2rx - 2.0 * eps_o
        t_self_q = t_self - eps_o
        self_hit = (crossing_b & (t_self_q > jnp.float32(FLT_EPS))
                    & (t_self_q <= limit))
        closer = self_hit & (t_self_q < t_o)
        t_m = jnp.where(closer, t_self_q, t_o)
        idx_m = jnp.where(closer, excl, idx_o)
        blocked = (idx_m >= 0) & (t_m <= limit)
    return idx_m, blocked


def _post_diff(payload, nops, od2, st2, ex, sh, d2rx, fslm, k_dop, *,
               live, blocked, occl_hit, spec: FusedSpec):
    """Differentiable core of the post-query stage: θ-clobber chain (parity),
    scattering coefficients, complex amplitude/delay/Doppler outputs —
    tracer.bounce_step's scatter-apply lines in the same op order
    (/root/reference/src/compute_paths.c:684-745).

    ``nops`` is the [nrx*3, B] stack of occluder normal rows (fetched
    in-kernel; zeros row-padding when parity="physical" never reads them).
    Returns ``(out, wf)``: the six output rows per rx stacked [6*nrx, B]
    and the write-mask scale rows [nrx, B].
    """
    if not spec.grad_positions:
        od2 = jax.lax.stop_gradient(od2)
        ex = jax.lax.stop_gradient(ex)
        sh = jax.lax.stop_gradient(sh)
        d2rx = jax.lax.stop_gradient(d2rx)
        fslm = jax.lax.stop_gradient(fslm)
        k_dop = jax.lax.stop_gradient(k_dop)
    d2 = od2[0:3]
    geo = payload[0:_GEOM]
    if not spec.grad_geometry:
        geo = jax.lax.stop_gradient(geo)
        nops = jax.lax.stop_gradient(nops)
    n, vel = geo[9:12], geo[12:15]
    eta = _eta_rows(payload)
    theta, cos_t1 = ex[0:1], ex[1:2]
    ndot = ex[2:3]
    ate_re, ate_im = st2[0:1], st2[1:2]
    atm_re, atm_im = st2[2:3], st2[3:4]
    tau2, freq2 = st2[4:5], st2[5:6]

    th_c, cos_c = theta, cos_t1
    outs, wfs, res_rows = [], [], []
    for k in range(spec.nrx):
        ds = sh[8 * k:8 * k + 3]
        d2rx_k = d2rx[k:k + 1]
        live_k = live
        blocked_k = blocked[k:k + 1]
        ds_dot_n = _dot3r(ds, n)
        cos_ts = jnp.clip(ds_dot_n, -_CLIP, _CLIP)
        theta_s = fast_acos(cos_ts)

        if spec.parity == "reference":
            occ_k = occl_hit[k:k + 1]
            n_o = nops[3 * k:3 * k + 3]
            cos_o = jnp.clip(jnp.abs(_dot3r(n_o, ds)), 0.0, _CLIP)
            th_o = fast_acos(cos_o)
            th_c = jnp.where(occ_k, th_o, th_c)
            cos_c = jnp.where(occ_k, cos_o, cos_c)
            theta_i, cos_ti = th_c, cos_c
            write = live_k & ~blocked_k
        else:
            theta_i, cos_ti = theta, cos_t1
            hemi = ds_dot_n * ndot < 0.0
            write = live_k & ~blocked_k & hemi
        sin_ti = jnp.sqrt(1.0 - cos_ti * cos_ti)

        s_te_re, s_te_im, s_tm_re, s_tm_im = scat_coefs(
            theta_s, theta_i, eta.s, eta.s1_alpha,
            cos_ts=cos_ts, cos_ti=cos_ti, sin_ti=sin_ti)

        out_te_re = ate_re * s_te_re - ate_im * s_te_im
        out_te_im = ate_re * s_te_im + ate_im * s_te_re
        out_tm_re = atm_re * s_tm_re - atm_im * s_tm_im
        out_tm_im = atm_re * s_tm_im + atm_im * s_tm_re

        fsl_s2 = (fslm * d2rx_k) ** 2
        sscale = jnp.where(fsl_s2 > 1.0,
                           1.0 / jnp.where(fsl_s2 > 1.0, fsl_s2, 1.0), 1.0)
        wf = write.astype(jnp.float32) * sscale
        out_tau = jnp.where(write, tau2 + d2rx_k / SPEED_OF_LIGHT, 0.0)
        scat_dop = _dot3r(ds - d2, vel) * k_dop
        out_freq = freq2 - jnp.where(live_k, scat_dop, 0.0)
        outs.append(jnp.concatenate(
            [out_te_re * wf, out_te_im * wf, out_tm_re * wf,
             out_tm_im * wf, out_tau, out_freq], axis=0))
        wfs.append(wf)
        # slim-backward residuals: the (constant under grad_positions=False)
        # angle quantities + write scale at which _post_light re-evaluates
        # only the scattering-coefficient chain
        res_rows.append(jnp.concatenate(
            [theta_s, jnp.broadcast_to(theta_i, theta_s.shape),
             cos_ts, jnp.broadcast_to(cos_ti, theta_s.shape),
             jnp.broadcast_to(sin_ti, theta_s.shape), wf], axis=0))
    res = jax.lax.stop_gradient(jnp.concatenate(res_rows, axis=0))
    return (jnp.concatenate(outs, axis=0), jnp.concatenate(wfs, axis=0),
            res)


def _post_light(ss_rows, st2, *, res, spec: FusedSpec):
    """Light backward core for the slim (grad_positions=False) post path:
    directive scattering coefficients re-evaluated at the SAVED angle
    residuals (res rows per rx: theta_s, theta_i, cos_ts, cos_ti, sin_ti,
    wf), the complex amplitude multiply, the masked tau carry and the freq
    identity (additive constants dropped: they do not change the
    transpose).  ``ss_rows`` is the [2, B] (s, s1_alpha) block — the ONLY
    payload columns this chain touches, so the slim backward fetches and
    scatter-adds 2 columns instead of 27 (VERDICT r4 item 2)."""
    s_row, s1_row = ss_rows[0], ss_rows[1]
    ate_re, ate_im = st2[0:1], st2[1:2]
    atm_re, atm_im = st2[2:3], st2[3:4]
    tau2, freq2 = st2[4:5], st2[5:6]
    outs = []
    for k in range(spec.nrx):
        r = res[6 * k:6 * k + 6]
        theta_s, theta_i = r[0:1], r[1:2]
        cos_ts, cos_ti, sin_ti = r[2:3], r[3:4], r[4:5]
        wf = r[5:6]
        s_te_re, s_te_im, s_tm_re, s_tm_im = scat_coefs(
            theta_s, theta_i, s_row, s1_row,
            cos_ts=cos_ts, cos_ti=cos_ti, sin_ti=sin_ti)
        out_te_re = ate_re * s_te_re - ate_im * s_te_im
        out_te_im = ate_re * s_te_im + ate_im * s_te_re
        out_tm_re = atm_re * s_tm_re - atm_im * s_tm_im
        out_tm_im = atm_re * s_tm_im + atm_im * s_tm_re
        out_tau = jnp.where(wf > 0, tau2, 0.0)
        outs.append(jnp.concatenate(
            [out_te_re * wf, out_te_im * wf, out_tm_re * wf,
             out_tm_im * wf, out_tau, freq2], axis=0))
    return jnp.concatenate(outs, axis=0)


def _post_bwd_slim_kernel(limbss_ref, st2_ref, excl_ref, res_ref, dout_ref,
                          dst2_ref, dtab_ref, *, spec: FusedSpec, t: int):
    """Slim post backward: vjp of :func:`_post_light` at the saved angle
    residuals — no geometric or occlusion recompute at all (the decisions
    are folded into the saved ``wf``).  ``limbss_ref`` is the (s, s1_alpha)
    limb table [6, T]; one shared one-hot feeds fetch and scatter."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    excl = excl_ref[...]
    safe = jnp.maximum(excl, 0)
    oht = _oht_bf16(safe, t)
    ss_rows = _fetch_rows_oht(limbss_ref[...], oht)             # [2, B]
    if "novjp" in _ABLATE:                     # probe-only attribution
        d_ss, d_st2 = ss_rows, dout_ref[...][0:6]
    else:
        f = functools.partial(_post_light, res=res_ref[...], spec=spec)
        _, vjpfn = jax.vjp(f, ss_rows, st2_ref[...])
        d_ss, d_st2 = vjpfn(dout_ref[...])
    dst2_ref[...] = d_st2
    if "stepped_acc" in _ABLATE:
        dtab_ref[...] = _scatter_add_oht(oht, d_ss)[None]
    elif "noscatter" not in _ABLATE:
        dtab_ref[...] += _scatter_add_oht(oht, d_ss)            # [T, 6]


def _post_fwd_kernel(sc_ref, limbs_ref, limbsn_ref, od2_ref, st2_ref,
                     ex_ref, sh_ref, d2rx_ref, tself_ref, cross_ref,
                     excl_ref, live_ref, to_ref, io_ref, out_ref, write_ref,
                     res_ref, *, spec: FusedSpec, t: int):
    fslm = sc_ref[0]
    k_dop = sc_ref[1]
    live = live_ref[...] != 0
    excl = excl_ref[...]
    safe = jnp.maximum(excl, 0)
    payload = _fetch_rows(limbs_ref[...], safe, t)
    live_b = jnp.broadcast_to(live, to_ref.shape)
    idx_m, blocked = _post_decisions(
        to_ref[...], io_ref[...], tself_ref[...], cross_ref[...], excl,
        d2rx_ref[...], live_b, spec)
    occl_hit = idx_m >= 0
    if spec.parity == "reference":
        safe_o = jnp.maximum(idx_m, 0)
        nops = jnp.concatenate(
            [_fetch_rows(limbsn_ref[...], safe_o[k:k + 1], t)
             for k in range(spec.nrx)], axis=0)
    else:
        nops = jnp.zeros((3 * spec.nrx,) + excl.shape[1:], jnp.float32)

    out, wf, res = _post_diff(payload, nops, od2_ref[...], st2_ref[...],
                              ex_ref[...], sh_ref[...], d2rx_ref[...], fslm,
                              k_dop, live=live, blocked=blocked,
                              occl_hit=occl_hit, spec=spec)
    out_ref[...] = out
    write_ref[...] = (wf > 0).astype(jnp.int32)
    res_ref[...] = res


def _post_bwd_kernel(sc_ref, limbs_ref, limbsn_ref, od2_ref, st2_ref,
                     ex_ref, sh_ref, d2rx_ref, tself_ref, cross_ref,
                     excl_ref, live_ref, to_ref, io_ref, dout_ref,
                     *outs, spec: FusedSpec, t: int):
    (dod2_ref, dst2_ref, dex_ref, dsh_ref, dd2rx_ref, dtab_ref,
     dsc_ref) = outs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)
        dsc_ref[...] = jnp.zeros_like(dsc_ref)

    fslm = sc_ref[0]
    k_dop = sc_ref[1]
    live = live_ref[...] != 0
    excl = excl_ref[...]
    safe = jnp.maximum(excl, 0)
    oht = _oht_bf16(safe, t)          # shared: fetch + scatter contraction
    payload = _fetch_rows_oht(limbs_ref[...], oht)
    live_b = jnp.broadcast_to(live, to_ref.shape)
    idx_m, blocked = _post_decisions(
        to_ref[...], io_ref[...], tself_ref[...], cross_ref[...], excl,
        d2rx_ref[...], live_b, spec)
    occl_hit = idx_m >= 0
    safe_o = jnp.maximum(idx_m, 0)
    if spec.parity == "reference":
        nops = jnp.concatenate(
            [_fetch_rows(limbsn_ref[...], safe_o[k:k + 1], t)
             for k in range(spec.nrx)], axis=0)
    else:
        nops = jnp.zeros((3 * spec.nrx,) + excl.shape[1:], jnp.float32)

    f = functools.partial(_post_diff, live=live, blocked=blocked,
                          occl_hit=occl_hit, spec=spec)
    _, vjpfn = jax.vjp(f, payload, nops, od2_ref[...], st2_ref[...],
                       ex_ref[...], sh_ref[...], d2rx_ref[...], fslm, k_dop)
    # cotangents: the six output rows per rx; wf and the slim residual rows
    # carry none (wf is re-derived, res is stop-gradded)
    zrow = lambda k: jnp.zeros((k,) + excl.shape[1:], jnp.float32)
    (d_payload, d_nops, d_od2, d_st2, d_ex, d_sh, d_d2rx, d_fslm,
     d_kdop) = vjpfn((dout_ref[...], zrow(spec.nrx), zrow(6 * spec.nrx)))

    dst2_ref[...] = d_st2
    dtab = _scatter_add_oht(oht, d_payload)
    if spec.grad_geometry and spec.parity == "reference":
        # occluder-normal cotangents scatter into the table's normal
        # columns: pad each rx's [3, B] normal cotangent to full payload
        # rows (a sublane concat) and reuse the limb scatter
        for k in range(spec.nrx):
            dpn = jnp.concatenate(
                [zrow(_GEOM - 6), d_nops[3 * k:3 * k + 3], zrow(15)],
                axis=0)
            dtab += _scatter_add_tile(safe_o[k:k + 1], dpn, t)
    dtab_ref[...] += dtab
    dod2_ref[...] = d_od2
    dex_ref[...] = d_ex
    dsh_ref[...] = d_sh
    dd2rx_ref[...] = d_d2rx
    lane = jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 0)
    dsc_ref[...] += jnp.where(
        (row == 0) & (lane == 0), d_fslm,
        jnp.where((row == 0) & (lane == 1), d_kdop, 0.0))


# ---------------------------------------------------------------------------
# pallas_call plumbing

def _row(k, block):
    return pl.BlockSpec((k, block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _whole():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _limb_table(table):
    """[T, C] f32 -> [3C, T] bf16 limb rows, limb groups stacked on ROWS
    (XLA-side barriered split; see _fetch_rows for the layout rationale)."""
    from .fetch import _split3_bf16
    return jnp.concatenate(_split3_bf16(table.T), axis=0)


def _pad_rows(x, r_pad, value=0):
    r = x.shape[-1]
    if r_pad > r:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, r_pad - r),),
                    constant_values=value)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def bounce_pre(spec: FusedSpec, od, st, act, idx, table, rx_pos, fslm,
               k_dop):
    """Fused pre-query bounce stage.

    Args: ``od`` f32[8, R] ray operand rows (d, o, zeros); ``st`` f32[6, R]
    state rows (ate_re, ate_im, atm_re, atm_im, tau, freq); ``act`` bool[R];
    ``idx`` i32[R] bounce-query hit ids; ``table`` f32[T, 27] fused payload
    table; ``rx_pos`` f32[nrx, 3]; scalars ``fslm``/``k_dop``.

    Returns ``(od2, st2, ex, sh, d2rx, t_self, crossing, excl, live)`` —
    see :func:`_pre_diff`/:func:`_pre_nondiff`.
    """
    out, _ = _bounce_pre_fwd(spec, od, st, act, idx, table, rx_pos, fslm,
                             k_dop)
    return out


def _bounce_pre_fwd(spec, od, st, act, idx, table, rx_pos, fslm, k_dop,
                    material=None):
    t, c = table.shape
    R = od.shape[-1]
    block = spec.block
    r_pad = _round_up(max(R, block), block)
    limbs = _limb_table(table)
    od_p = _pad_rows(od, r_pad)
    st_p = _pad_rows(st, r_pad)
    act_p = _pad_rows(act.astype(jnp.int32).reshape(1, -1), r_pad)
    idx_p = _pad_rows(jax.lax.stop_gradient(idx).reshape(1, -1), r_pad,
                      value=-1)
    sc = jnp.stack([jnp.asarray(fslm, jnp.float32).reshape(()),
                    jnp.asarray(k_dop, jnp.float32).reshape(())])
    nrx = spec.nrx
    with_mat = material is not None
    shapes = [
        jax.ShapeDtypeStruct((8, r_pad), jnp.float32),        # od2
        jax.ShapeDtypeStruct((6, r_pad), jnp.float32),        # st2
        jax.ShapeDtypeStruct((3, r_pad), jnp.float32),        # ex
        jax.ShapeDtypeStruct((nrx * 8, r_pad), jnp.float32),  # sh
        jax.ShapeDtypeStruct((nrx, r_pad), jnp.float32),      # d2rx
        jax.ShapeDtypeStruct((nrx, r_pad), jnp.float32),      # t_self
        jax.ShapeDtypeStruct((nrx, r_pad), jnp.int32),        # crossing
        jax.ShapeDtypeStruct((1, r_pad), jnp.int32),          # excl
        jax.ShapeDtypeStruct((1, r_pad), jnp.int32),          # live
        jax.ShapeDtypeStruct((3, r_pad), jnp.float32),        # res (bwd)
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM), _whole(),
                _row(8, block), _row(6, block), _row(1, block),
                _row(1, block)]
    ops = (sc, rx_pos, limbs, od_p, st_p, act_p, idx_p)
    if with_mat:
        matrow = (jax.lax.stop_gradient(jnp.asarray(material, jnp.int32))
                  .astype(jnp.bfloat16).reshape(1, t))
        in_specs.append(_whole())
        ops = ops + (matrow,)
        shapes.append(jax.ShapeDtypeStruct((1, r_pad), jnp.int32))  # mat
    outs = pl.pallas_call(
        functools.partial(_pre_fwd_kernel, spec=spec, t=t,
                          with_mat=with_mat),
        grid=(r_pad // block,),
        in_specs=in_specs,
        out_specs=[_row(s.shape[0], block) for s in shapes],
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=spec.interpret,
    )(*ops)
    outs = tuple(x[:, :R] for x in outs)
    if with_mat:
        return outs[:-2], (od, st, act, idx, table, rx_pos, outs[-2],
                           outs[-1])
    return outs[:-1], (od, st, act, idx, table, rx_pos, outs[-1])


def _bounce_pre_fwd_vjp(spec, od, st, act, idx, table, rx_pos, fslm, k_dop):
    out, res = _bounce_pre_fwd(spec, od, st, act, idx, table, rx_pos, fslm,
                               k_dop)
    return out, res + (fslm, k_dop)


def _bounce_pre_bwd_vjp(spec, res, cots):
    od, st, act, idx, table, rx_pos, res_pre, fslm, k_dop = res
    (d_od2, d_st2, d_ex, d_sh, d_d2rx, *_rest) = cots
    t, c = table.shape
    R = od.shape[-1]
    block = spec.block
    r_pad = _round_up(max(R, block), block)
    st_p = _pad_rows(st, r_pad)
    act_p = _pad_rows(act.astype(jnp.int32).reshape(1, -1), r_pad)
    idx_p = _pad_rows(jax.lax.stop_gradient(idx).reshape(1, -1), r_pad,
                      value=-1)
    nrx = spec.nrx
    acc = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)

    if not spec.grad_positions:
        # slim path: vjp of the Fresnel/amplitude chain only, at the saved
        # incidence residuals — nothing geometric is recomputed or shipped,
        # and the table cotangent covers ONLY the 12 eta columns (the
        # geometry rows are structurally zero under the grad_geometry=False
        # pairing FusedSpec asserts; r4's 27-column scatter-add was the
        # measured bulk of the 8.1 ms slim backward, VERDICT r4 item 2)
        ce = len(ETA_FIELDS)
        limbs_e = _limb_table(table[:, _GEOM:])                 # [3*12, T]
        stepped = "stepped_acc" in _ABLATE
        n_steps = r_pad // block
        if stepped:
            tab_shape = jax.ShapeDtypeStruct((n_steps, t, 3 * ce),
                                             jnp.float32)
            tab_spec = pl.BlockSpec((1, t, 3 * ce), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
            sem = ("parallel",)
        else:
            tab_shape = jax.ShapeDtypeStruct((t, 3 * ce), jnp.float32)
            tab_spec = acc((t, 3 * ce))
            sem = ("arbitrary",)
        shapes = [
            jax.ShapeDtypeStruct((6, r_pad), jnp.float32),      # d_st
            tab_shape,                                          # d_eta limbs
        ]
        outs = pl.pallas_call(
            functools.partial(_pre_bwd_slim_kernel, spec=spec, t=t),
            grid=(n_steps,),
            in_specs=[_whole(), _row(6, block), _row(1, block),
                      _row(1, block), _row(3, block), _row(6, block)],
            out_specs=[_row(6, block), tab_spec],
            out_shape=shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=sem),
            interpret=spec.interpret,
        )(limbs_e, st_p, act_p, idx_p, _pad_rows(res_pre, r_pad),
          _pad_rows(d_st2, r_pad))
        d_st, d_tab3 = outs
        if stepped:
            d_tab3 = jnp.sum(d_tab3, axis=0)
        d_tab = jnp.pad(_sum_limb_groups(d_tab3), ((0, 0), (_GEOM, 0)))
        return (None, d_st[:, :R], None, None, d_tab, None, None, None)

    limbs = _limb_table(table)
    od_p = _pad_rows(od, r_pad)
    sc = jnp.stack([jnp.asarray(fslm, jnp.float32).reshape(()),
                    jnp.asarray(k_dop, jnp.float32).reshape(())])
    rx_rows = _round_up(max(nrx, 8), 8)
    shapes = [
        jax.ShapeDtypeStruct((8, r_pad), jnp.float32),      # d_od
        jax.ShapeDtypeStruct((6, r_pad), jnp.float32),      # d_st
        jax.ShapeDtypeStruct((t, 3 * c), jnp.float32),      # d_tab limbs
        jax.ShapeDtypeStruct((rx_rows, 128), jnp.float32),  # d_rxp acc
        jax.ShapeDtypeStruct((8, 128), jnp.float32),        # d_sc acc
    ]
    outs = pl.pallas_call(
        functools.partial(_pre_bwd_kernel, spec=spec, t=t),
        grid=(r_pad // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM), _whole(),
                  _row(8, block), _row(6, block), _row(1, block),
                  _row(1, block),
                  _row(8, block), _row(6, block), _row(3, block),
                  _row(nrx * 8, block), _row(nrx, block)],
        out_specs=[_row(8, block), _row(6, block), acc((t, 3 * c)),
                   acc((rx_rows, 128)), acc((8, 128))],
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=spec.interpret,
    )(sc, rx_pos, limbs, od_p, st_p, act_p, idx_p,
      _pad_rows(d_od2, r_pad), _pad_rows(d_st2, r_pad),
      _pad_rows(d_ex, r_pad), _pad_rows(d_sh, r_pad),
      _pad_rows(d_d2rx, r_pad))
    d_od, d_st, d_tab3, d_rxp_acc, d_sc_acc = outs
    d_rxp = d_rxp_acc[:nrx, :3]
    d_fslm = d_sc_acc[0, 0].astype(jnp.float32)
    d_kdop = d_sc_acc[0, 1].astype(jnp.float32)
    return (d_od[:, :R], d_st[:, :R], None, None, _sum_limb_groups(d_tab3),
            d_rxp, d_fslm, d_kdop)


bounce_pre.defvjp(_bounce_pre_fwd_vjp, _bounce_pre_bwd_vjp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def bounce_post(spec: FusedSpec, od2, st2, ex, sh, d2rx, t_self, crossing,
                excl, live, t_o, idx_o, table, fslm, k_dop):
    """Fused post-query bounce stage.

    ``t_o``/``idx_o`` are the shadow-query results [nrx, R].  Returns
    ``(out, write)`` with ``out`` f32[nrx*6, R] — per rx the rows
    (te_re, te_im, tm_re, tm_im, tau, freq) — and ``write`` i32[nrx, R].
    """
    out, _ = _bounce_post_fwd(spec, od2, st2, ex, sh, d2rx, t_self,
                              crossing, excl, live, t_o, idx_o, table,
                              fslm, k_dop)
    return out


def _post_operands(spec, od2, st2, ex, sh, d2rx, t_self, crossing, excl,
                   live, t_o, idx_o, table, fslm, k_dop):
    t, c = table.shape
    R = od2.shape[-1]
    block = spec.block
    r_pad = _round_up(max(R, block), block)
    limbs = _limb_table(table)
    limbsn = _limb_table(table[:, 9:12])        # occluder-normal columns
    sc = jnp.stack([jnp.asarray(fslm, jnp.float32).reshape(()),
                    jnp.asarray(k_dop, jnp.float32).reshape(())])
    sg = jax.lax.stop_gradient
    ops = (sc, limbs, limbsn, _pad_rows(od2, r_pad), _pad_rows(st2, r_pad),
           _pad_rows(ex, r_pad), _pad_rows(sh, r_pad),
           _pad_rows(d2rx, r_pad), _pad_rows(sg(t_self), r_pad),
           _pad_rows(sg(crossing), r_pad), _pad_rows(sg(excl), r_pad,
                                                     value=-1),
           _pad_rows(sg(live), r_pad),
           _pad_rows(sg(t_o), r_pad, value=np.inf),
           _pad_rows(sg(idx_o), r_pad, value=-1))
    return ops, t, c, R, r_pad


def _bounce_post_fwd(spec, od2, st2, ex, sh, d2rx, t_self, crossing, excl,
                     live, t_o, idx_o, table, fslm, k_dop):
    ops, t, c, R, r_pad = _post_operands(
        spec, od2, st2, ex, sh, d2rx, t_self, crossing, excl, live, t_o,
        idx_o, table, fslm, k_dop)
    nrx = spec.nrx
    block = spec.block
    shapes = [jax.ShapeDtypeStruct((nrx * 6, r_pad), jnp.float32),
              jax.ShapeDtypeStruct((nrx, r_pad), jnp.int32),
              jax.ShapeDtypeStruct((nrx * 6, r_pad), jnp.float32)]  # res
    outs = pl.pallas_call(
        functools.partial(_post_fwd_kernel, spec=spec, t=t),
        grid=(r_pad // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), _whole(), _whole(),
                  _row(8, block), _row(6, block), _row(3, block),
                  _row(nrx * 8, block), _row(nrx, block), _row(nrx, block),
                  _row(nrx, block), _row(1, block), _row(1, block),
                  _row(nrx, block), _row(nrx, block)],
        out_specs=[_row(nrx * 6, block), _row(nrx, block),
                   _row(nrx * 6, block)],
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=spec.interpret,
    )(*ops)
    outs = tuple(x[:, :R] for x in outs)
    res = (od2, st2, ex, sh, d2rx, t_self, crossing, excl, live, t_o,
           idx_o, table, fslm, k_dop, outs[-1])
    return outs[:-1], res


def _bounce_post_bwd(spec, res, cots):
    (od2, st2, ex, sh, d2rx, t_self, crossing, excl, live, t_o, idx_o,
     table, fslm, k_dop, res_post) = res
    d_out, _d_write = cots
    nrx = spec.nrx
    block = spec.block
    t, c = table.shape
    R = od2.shape[-1]
    r_pad = _round_up(max(R, block), block)
    acc = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    cut = lambda x: x[:, :R]

    if not spec.grad_positions:
        # slim path: vjp of the scattering/amplitude chain only, at the
        # saved angle residuals — no occlusion or geometry recompute, and
        # the table cotangent covers ONLY the (s, s1_alpha) pair: the sole
        # payload columns :func:`_post_light` touches (VERDICT r4 item 2)
        limbs_ss = _limb_table(table[:, _GEOM + 10:_GEOM + 12])  # [6, T]
        stepped = "stepped_acc" in _ABLATE
        n_steps = r_pad // block
        if stepped:
            tab_shape = jax.ShapeDtypeStruct((n_steps, t, 6), jnp.float32)
            tab_spec = pl.BlockSpec((1, t, 6), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
            sem = ("parallel",)
        else:
            tab_shape = jax.ShapeDtypeStruct((t, 6), jnp.float32)
            tab_spec = acc((t, 6))
            sem = ("arbitrary",)
        shapes = [
            jax.ShapeDtypeStruct((6, r_pad), jnp.float32),      # d_st2
            tab_shape,                                          # d_ss limbs
        ]
        outs = pl.pallas_call(
            functools.partial(_post_bwd_slim_kernel, spec=spec, t=t),
            grid=(n_steps,),
            in_specs=[_whole(), _row(6, block), _row(1, block),
                      _row(nrx * 6, block), _row(nrx * 6, block)],
            out_specs=[_row(6, block), tab_spec],
            out_shape=shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=sem),
            interpret=spec.interpret,
        )(limbs_ss, _pad_rows(st2, r_pad),
          _pad_rows(jax.lax.stop_gradient(excl), r_pad, value=-1),
          _pad_rows(res_post, r_pad), _pad_rows(d_out, r_pad))
        d_st2, d_tab3 = outs
        if stepped:
            d_tab3 = jnp.sum(d_tab3, axis=0)
        d_tab = jnp.pad(_sum_limb_groups(d_tab3), ((0, 0), (_GEOM + 10, 0)))
        return (None, cut(d_st2), None, None, None, None, None, None, None,
                None, None, d_tab, None, None)

    ops, t, c, R, r_pad = _post_operands(
        spec, od2, st2, ex, sh, d2rx, t_self, crossing, excl, live, t_o,
        idx_o, table, fslm, k_dop)
    shapes = [
        jax.ShapeDtypeStruct((8, r_pad), jnp.float32),        # d_od2
        jax.ShapeDtypeStruct((6, r_pad), jnp.float32),        # d_st2
        jax.ShapeDtypeStruct((3, r_pad), jnp.float32),        # d_ex
        jax.ShapeDtypeStruct((nrx * 8, r_pad), jnp.float32),  # d_sh
        jax.ShapeDtypeStruct((nrx, r_pad), jnp.float32),      # d_d2rx
        jax.ShapeDtypeStruct((t, 3 * c), jnp.float32),        # d_tab limbs
        jax.ShapeDtypeStruct((8, 128), jnp.float32),          # d_sc
    ]
    out_specs = [_row(8, block), _row(6, block), _row(3, block),
                 _row(nrx * 8, block), _row(nrx, block), acc((t, 3 * c)),
                 acc((8, 128))]
    outs = pl.pallas_call(
        functools.partial(_post_bwd_kernel, spec=spec, t=t),
        grid=(r_pad // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), _whole(), _whole(),
                  _row(8, block), _row(6, block), _row(3, block),
                  _row(nrx * 8, block), _row(nrx, block), _row(nrx, block),
                  _row(nrx, block), _row(1, block), _row(1, block),
                  _row(nrx, block), _row(nrx, block),
                  _row(nrx * 6, block)],
        out_specs=out_specs,
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=spec.interpret,
    )(*ops, _pad_rows(d_out, r_pad))
    d_od2, d_st2, d_ex, d_sh, d_d2rx, d_tab3, d_sc_acc = outs
    return (cut(d_od2), cut(d_st2), cut(d_ex), cut(d_sh), cut(d_d2rx),
            None, None, None, None, None, None, _sum_limb_groups(d_tab3),
            d_sc_acc[0, 0].astype(jnp.float32),
            d_sc_acc[0, 1].astype(jnp.float32))


bounce_post.defvjp(_bounce_post_fwd, _bounce_post_bwd)


# ---------------------------------------------------------------------------
# whole-loop slim backward: ONE Pallas kernel for the entire bounce loop
#
# probe_r5d attribution of the per-stage slim backwards (6 kernel launches
# per 3-bounce trace, 8.1 ms device): vjp chains ~4.8 ms, scatter-add
# contraction ~4.7 ms, base oht/fetch/IO ~2.6 ms — with strong overlap
# between the buckets, pointing at the serialized "arbitrary" accumulator
# grids and the per-launch d_st/d_st2 HBM round trips rather than raw
# FLOPs.  The whole-loop form removes all of it structurally: the grid is
# parallel over ray tiles, the bounce loop runs INSIDE the kernel (B is
# static and small), the d_st cotangent carry lives in registers between
# bounces, ONE one-hot per (tile, bounce) feeds both the eta fetch and the
# scatter contraction for both the pre and post chains (s/s1_alpha are eta
# columns 10/11), and the table cotangent accumulates across bounces
# in-register with a single per-tile write (stepped layout, XLA-summed —
# the measured-neutral probe_r5d "stepped_acc" form that keeps the grid
# parallel).

def _loop_bwd_slim_kernel(limbse_ref, st_ref, live_ref, mat_ref,
                          respre_ref, respost_ref, dout_ref,
                          dst0_ref, dtab_ref, *, spec: FusedSpec, t: int,
                          nb: int):
    """``t`` here is the MATERIAL count, not the triangle count: the slim
    backward only ever touches the 12 eta columns, and those are the same
    per-material rows for every triangle of a material
    (``eta[mat][tri] == eta_tab[mat[tri]]`` bit-exactly) — so the one-hot
    fetch AND the scatter contraction run against the ~17-row per-material
    table instead of the [T, 27] triangle table.  probe_r5h measured the
    triangle-level scatter at 3.9 ms of the 9.6 ms backward; the material
    form cuts its one-hot rows ~15x and returns the cotangent directly in
    material coordinates (no XLA-side segment-by-material pass left)."""
    limbs_e = limbse_ref[...]
    block = dst0_ref.shape[-1]
    d_carry = jnp.zeros((6, block), jnp.float32)
    acc = jnp.zeros((t, limbs_e.shape[0]), jnp.float32)
    for b in range(nb - 1, -1, -1):
        live = live_ref[b, :, :] != 0                         # [1, block]
        if "nofetch" in _ABLATE:          # probe-only; implies noscatter
            oht = None
            eta_rows = jnp.full((len(ETA_FIELDS), block), 0.5, jnp.float32)
        else:
            oht = _oht_bf16(mat_ref[b, :, :], t)
            eta_rows = _fetch_rows_oht(limbs_e, oht)          # [12, block]
        st_b = st_ref[b, :, :]
        st2_b = st_ref[b + 1, :, :]
        # post chain at the saved angle residuals (wf folds the decisions)
        if "novjp" in _ABLATE:             # probe-only attribution (r5h)
            d_ss, d_st2 = eta_rows[10:12], dout_ref[b, 0:6, :]
            d_st2 = d_st2 + d_carry
            d_eta, d_carry = eta_rows, d_st2
        else:
            f_post = functools.partial(_post_light,
                                       res=respost_ref[b, :, :], spec=spec)
            _, vjp_post = jax.vjp(f_post, eta_rows[10:12], st2_b)
            d_ss, d_st2 = vjp_post(dout_ref[b, :, :])
            d_st2 = d_st2 + d_carry      # + next bounce's pre-chain carry
            # pre chain at the saved incidence residuals
            res_pre = respre_ref[b, :, :]
            f_pre = functools.partial(_pre_light, live=live,
                                      cos_t1=res_pre[0:1],
                                      sin_t1=res_pre[1:2],
                                      fscale=res_pre[2:3])
            _, vjp_pre = jax.vjp(f_pre, eta_rows, st_b)
            d_eta, d_carry = vjp_pre(d_st2)
        # fold the post chain's (s, s1_alpha) cotangent into eta rows 10/11
        # — the shared one-hot makes both scatters one contraction (the
        # contributions are zero wherever pre/post indices could differ:
        # both chains mask by the same liveness/write decisions)
        d_eta = jnp.concatenate([d_eta[0:10], d_eta[10:12] + d_ss], axis=0)
        if "noscatter" not in _ABLATE:
            if "swapscatter" in _ABLATE:       # probe_r5n lowering A/B
                acc = acc + _scatter_add_oht_swapped(oht, d_eta)
            else:
                acc = acc + _scatter_add_oht(oht, d_eta)
    dst0_ref[...] = d_carry
    dtab_ref[...] = acc[None]


def _fused_loop_bwd_slim(spec: FusedSpec, nb: int, eta_tab, st_all, live_all,
                         mat_all, res_pre_all, res_post_all, d_outs):
    """Plumbing for :func:`_loop_bwd_slim_kernel`.

    ``eta_tab`` [M, 12] per-material eta table, ``st_all`` [nb+1, 6, R]
    (st_0..st_B), ``live_all``/``mat_all`` [nb, 1, R] i32 (mat_all = the
    hit material id per ray, already masked to a safe row), ``res_pre_all``
    [nb, 3, R], ``res_post_all``/``d_outs`` [nb, 6*nrx, R].  Returns
    (d_st0 [6, R], d_eta_tab [M, 12])."""
    m0 = eta_tab.shape[0]
    if _MAT_ROWS_PAD and m0 < _MAT_ROWS_PAD:
        eta_tab = jnp.pad(eta_tab, ((0, _MAT_ROWS_PAD - m0), (0, 0)))
    t, c = eta_tab.shape
    R = st_all.shape[-1]
    # the backward tile is independent of the forward's: the nb unrolled
    # vjp chains' intermediates all live on the scoped-vmem stack at once
    # (Mosaic does not reuse buffers across the in-kernel bounce loop), and
    # block=4096 measured 26.6M > the 16M scoped limit at nb=3 (probe_r5f).
    # The res_post/d_out stacks scale with nrx (6*nrx*nb rows each): nrx=8
    # at block=2048 measured 22.45M > 16M (probe_r5m) — halve the tile
    # from nrx=5 up.
    block = min(spec.block,
                _LOOP_BWD_BLOCK if spec.nrx <= 4 else _LOOP_BWD_BLOCK // 2)
    r_pad = _round_up(max(R, block), block)
    n_steps = r_pad // block
    ce = len(ETA_FIELDS)
    limbs_e = _limb_table(eta_tab)                            # [3*12, M]
    snrx = 6 * spec.nrx

    def pad3(x, value=0):
        r = x.shape[-1]
        if r_pad > r:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, r_pad - r)),
                        constant_values=value)
        return x

    def whole3(shape):
        return pl.BlockSpec(shape[:-1] + (block,),
                            lambda i: (0,) * (len(shape) - 1) + (i,),
                            memory_space=pltpu.VMEM)

    shapes = [
        jax.ShapeDtypeStruct((6, r_pad), jnp.float32),         # d_st0
        jax.ShapeDtypeStruct((n_steps, t, 3 * ce), jnp.float32),
    ]
    outs = pl.pallas_call(
        functools.partial(_loop_bwd_slim_kernel, spec=spec, t=t, nb=nb),
        grid=(n_steps,),
        in_specs=[_whole(),
                  whole3((nb + 1, 6, r_pad)),
                  whole3((nb, 1, r_pad)),
                  whole3((nb, 1, r_pad)),
                  whole3((nb, 3, r_pad)),
                  whole3((nb, snrx, r_pad)),
                  whole3((nb, snrx, r_pad))],
        out_specs=[_row(6, block),
                   pl.BlockSpec((1, t, 3 * ce), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=spec.interpret,
    )(limbs_e, pad3(st_all), pad3(live_all), pad3(mat_all),
      pad3(res_pre_all), pad3(res_post_all), pad3(d_outs))
    d_st0, d_tab3 = outs
    d_eta_tab = _sum_limb_groups(jnp.sum(d_tab3, axis=0))[:m0]  # [M, 12]
    return d_st0[:, :R], d_eta_tab


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def fused_loop_slim(spec: FusedSpec, nb: int, bq, sq, keep_rays: bool,
                    od0, st0, act0, pidx0, table, eta_tab, material,
                    rx_pos, fslm, k_dop, bq_consts, sq_consts):
    """The whole fused bounce loop as ONE custom_vjp (slim backward only:
    requires ``spec.grad_positions=False``).

    ``bq``/``sq`` are closure-converted pure query functions (bounce
    nearest-hit and batched shadow nearest-hit) with their captured arrays
    in ``bq_consts``/``sq_consts`` — both queries are non-differentiable,
    so the backward ignores them and runs :func:`_loop_bwd_slim_kernel`
    once over the saved per-bounce residuals.  The materials cotangent is
    returned on ``eta_tab`` (the [M, 12] per-material eta table; the
    forward fetches bit-identical values from ``table``'s eta columns, so
    declaring ``table`` non-differentiable here is exact — the slim
    backward touches eta alone, and ``eta[mat][tri] == eta_tab[mat[tri]]``
    bit-exactly).  ``material`` i32[T] maps triangle -> material row.

    Returns ``(outs [nb, 6*nrx, R], writes i32[nb, nrx, R],
    sh [nb, nrx*8, R], live i32[nb, R], od2s)`` with ``od2s``
    ``[nb, 8, R]`` when ``keep_rays`` else ``None``.
    """
    if spec.grad_positions:
        raise ValueError("fused_loop_slim requires grad_positions=False")
    out, _ = _fused_loop_slim_fwd(spec, nb, bq, sq, keep_rays, od0, st0,
                                  act0, pidx0, table, eta_tab, material,
                                  rx_pos, fslm, k_dop, bq_consts, sq_consts)
    return out


def _fused_loop_slim_fwd(spec, nb, bq, sq, keep_rays, od0, st0, act0, pidx0,
                         table, eta_tab, material, rx_pos, fslm, k_dop,
                         bq_consts, sq_consts):
    od, st, act, pidx = od0, st0, act0, pidx0
    outs, writes, shs, lives, od2s = [], [], [], [], []
    sts, mats, res_pres, res_posts = [st0], [], [], []
    for _b in range(nb):
        idx = jax.lax.stop_gradient(bq(od, pidx, act, *bq_consts))
        # the pre kernel also emits the hit MATERIAL row (clamped index;
        # dead rays carry zero cotangent so any safe row is fine) — the
        # XLA-side material[idx] gather lowered as a ~10 ms scalar fusion
        # per bounce in this graph (trace_r5k)
        pre_out, pre_res = _bounce_pre_fwd(spec, od, st, act, idx, table,
                                           rx_pos, fslm, k_dop,
                                           material=material)
        (od2, st2, ex, sh, d2rx, t_self, crossing, excl, live_i) = pre_out
        t_o, idx_o = sq(sh, d2rx, excl[0], live_i[0], *sq_consts)
        post_out, post_res = _bounce_post_fwd(
            spec, od2, st2, ex, sh, d2rx, t_self, crossing, excl, live_i,
            t_o, idx_o, table, fslm, k_dop)
        out, write = post_out
        outs.append(out)
        writes.append(write)
        shs.append(sh)
        lives.append(live_i)
        mats.append(pre_res[-1])
        res_pres.append(pre_res[-2])
        res_posts.append(post_res[-1])
        sts.append(st2)
        if keep_rays:
            od2s.append(od2)
        od, st, act, pidx = od2, st2, live_i[0] != 0, excl[0]
    stk = lambda xs: jnp.stack(xs, axis=0)
    primal = (stk(outs), stk(writes), stk(shs),
              jnp.concatenate(lives, axis=0),
              stk(od2s) if keep_rays else None)
    resid = (eta_tab, stk(sts), stk(lives), stk(mats), stk(res_pres),
             stk(res_posts), bq_consts, sq_consts)
    return primal, resid


def _fused_loop_slim_bwd(spec, nb, bq, sq, keep_rays, resid, cots):
    (eta_tab, st_all, live_all, mat_all, res_pre_all, res_post_all,
     bq_consts, sq_consts) = resid
    d_outs = cots[0]                                    # [nb, 6*nrx, R]
    d_st0, d_eta_tab = _fused_loop_bwd_slim(
        spec, nb, eta_tab, st_all, live_all, mat_all, res_pre_all,
        res_post_all, d_outs)
    return (None, d_st0, None, None, None, d_eta_tab, None, None, None,
            None, tuple(None for _ in bq_consts),
            tuple(None for _ in sq_consts))


fused_loop_slim.defvjp(_fused_loop_slim_fwd, _fused_loop_slim_bwd)
