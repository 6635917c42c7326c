"""Pallas TPU kernel for batched ray-triangle nearest-hit queries.

This is the hot op of the whole framework: the reference spends >99.9% of its
time in the equivalent scalar loop (``/root/reference/src/compute_paths.c:237-287``
called from the bounce loop, SURVEY.md §3.2 cost model).

TPU-native design — NOT a port of the scalar Möller–Trumbore:

The per-(ray, triangle) MT quantities are rewritten as scalar triple products
so that each becomes a dense contraction of a per-ray feature vector against a
per-triangle matrix.  With ``s = o - v0``, ``m = o x d``, ``Nun = e1 x e2``:

    det   = e1 . (d x e2)        = -(d . Nun)
    u_num = s  . (d x e2)        =  e2 . m - d . (e2 x v0)
    v_num = d  . (s x e1)        = -e1 . m - d . (v0 x e1)
    t_num = e2 . (s x e1)        =   o . Nun - (v0 . Nun)

so a ``[TILE_T, 16] @ [16, TILE_R]`` matmul per quantity (K = 16 feature
rows: d, m, o, 1, padding) yields the whole tile of values on the MXU, and
the VPU does the epsilon tests + masked argmin reduction over the triangle
axis.  The grid walks (ray tiles x triangle tiles) with a running
(best_t, best_idx) accumulator in VMEM, giving the reference's
first-strict-min tie-break across tiles for free (ascending grid order).

The returned (t, idx) are hit *decisions*: the tracer re-derives all
differentiable quantities by gathering the chosen triangle (see
``hermespy_rt_tpu.ops.intersect.recompute_hit_t``), so this kernel needs no
custom VJP and runs identically under ``jax.grad``.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.model import TriangleSoA
from .intersect import FLT_EPS, T_MAX

__all__ = ["make_pallas_intersect", "pallas_intersect"]

_BIG = np.float32(np.inf)  # plain numpy scalar: jnp constants can't be
                           # captured by a pallas kernel body
_NFEAT = 16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tri_derived(tris: TriangleSoA):
    v0 = jax.lax.stop_gradient(tris.v0)
    e1 = jax.lax.stop_gradient(tris.e1)
    e2 = jax.lax.stop_gradient(tris.e2)
    nun = jnp.cross(e1, e2)                        # [T, 3]
    c_u = jnp.cross(e2, v0)
    c_v = jnp.cross(v0, e1)
    k = jnp.sum(v0 * nun, axis=-1, keepdims=True)  # [T, 1]
    return v0, e1, e2, nun, c_u, c_v, k


def _triangle_matrices(tris: TriangleSoA) -> jax.Array:
    """Per-triangle contraction matrices G f32[4, Tpad, 16] (det, u, v, t rows)
    for the MXU variant.  Computed from the SoA each call (O(T), fuses into
    the surrounding jit) and explicitly non-differentiable: hit decisions are
    piecewise constant.
    """
    v0, e1, e2, nun, c_u, c_v, k = _tri_derived(tris)
    T = v0.shape[0]
    zeros3 = jnp.zeros((T, 3), jnp.float32)
    zeros1 = jnp.zeros((T, 1), jnp.float32)
    pad = jnp.zeros((T, _NFEAT - 10), jnp.float32)
    # feature order: d(3), m(3), o(3), ones(1), pad(6)
    g_det = jnp.concatenate([-nun, zeros3, zeros3, zeros1, pad], axis=-1)
    g_u = jnp.concatenate([-c_u, e2, zeros3, zeros1, pad], axis=-1)
    g_v = jnp.concatenate([-c_v, -e1, zeros3, zeros1, pad], axis=-1)
    g_t = jnp.concatenate([zeros3, zeros3, nun, -k, pad], axis=-1)
    return jnp.stack([g_det, g_u, g_v, g_t])       # [4, T, 16]


def _ray_features(o: jax.Array, d: jax.Array, r_pad: int) -> jax.Array:
    """Ray feature matrix F f32[16, Rpad]: rows d, m = o x d, o, 1, padding."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    R = o.shape[0]
    m = jnp.cross(o, d)
    feats = jnp.concatenate(
        [d, m, o, jnp.ones((R, 1), jnp.float32),
         jnp.zeros((R, _NFEAT - 10), jnp.float32)], axis=-1)   # [R, 16]
    f = feats.T                                                # [16, R]
    if r_pad > R:
        f = jnp.pad(f, ((0, 0), (0, r_pad - R)))
    return f


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo capturing ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mt_terms_mxu(g_ref, f, precision):
    """det/u/v/t for the tile via 4 [TILE_T,16]@[16,TILE_R] MXU contractions.

    ``precision`` "highest" uses exact-f32 passes.  "high" implements the
    bf16x3 decomposition manually (Mosaic has no HIGH lowering): with
    g = gh + gl and f = fh + fl, ``g@f ~ gh@fh + gh@fl + gl@fh`` — three
    native-bf16 MXU passes, ~2x the speed of exact f32 at ~2^-16 relative
    error (only epsilon-edge hit decisions can differ; all differentiable
    quantities are recomputed in f32 from the returned indices).
    """
    if precision == jax.lax.Precision.HIGHEST:
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        return (dot(g_ref[0], f), dot(g_ref[1], f), dot(g_ref[2], f),
                dot(g_ref[3], f))

    fh, fl = _split_bf16(f)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)

    def dot3x(g):
        gh, gl = _split_bf16(g)
        return dot(gh, fh) + (dot(gh, fl) + dot(gl, fh))

    return (dot3x(g_ref[0]), dot3x(g_ref[1]), dot3x(g_ref[2]),
            dot3x(g_ref[3]))


def _tile_body(g_ref, f, t_ref, i_ref, j, block_tris, precision, t_lim):
    det, u_num, v_num, t_num = _mt_terms_mxu(g_ref, f, precision)
    inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    valid = ((jnp.abs(det) >= FLT_EPS)
             & (u >= -FLT_EPS) & (u <= 1.0 + FLT_EPS)
             & (v >= -FLT_EPS) & (u + v <= 1.0 + FLT_EPS)
             & (t > FLT_EPS) & (t < T_MAX))
    if t_lim is not None:
        valid = valid & (t <= t_lim)
    t_m = jnp.where(valid, t, _BIG)

    tile_min = jnp.min(t_m, axis=0, keepdims=True)             # [1, TILE_R]
    rows = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 0)
    tile_arg = jnp.min(
        jnp.where((t_m == tile_min) & valid, rows, jnp.int32(2**31 - 1)),
        axis=0, keepdims=True)                                 # first-min rows
    tile_idx = tile_arg + j * block_tris

    best_t = t_ref[...]
    improve = tile_min < best_t                                # strict: ties
    t_ref[...] = jnp.where(improve, tile_min, best_t)          # keep earlier
    i_ref[...] = jnp.where(improve, tile_idx, i_ref[...])


def _kernel(g_ref, f_ref, t_ref, i_ref, *, block_tris: int, precision):
    """One (ray-tile, tri-tile) step of the nearest-hit reduction."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_ref[...] = jnp.full_like(t_ref, _BIG)
        i_ref[...] = jnp.full_like(i_ref, -1)

    _tile_body(g_ref, f_ref[...], t_ref, i_ref, j, block_tris, precision,
               None)


def _kernel_culled(aabb_ref, g_ref, f_ref, lim_ref, t_ref, i_ref, *,
                   block_tris: int, precision, has_limit: bool):
    """Nearest-hit step with per-(ray-tile, tri-tile) AABB culling.

    ``aabb_ref`` holds one axis-aligned bounding box per triangle tile
    (f32[nTiles, 8]: xmin,ymin,zmin,xmax,ymax,zmax,pad).  A slab test of
    every ray in the tile against the box decides whether the whole
    [TILE_T x TILE_R] evaluation can be skipped — with range-limited queries
    (shadow rays: the reference's 1-metre occlusion window,
    /root/reference/src/compute_paths.c:678-683) most tiles are.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_ref[...] = jnp.full_like(t_ref, _BIG)
        i_ref[...] = jnp.full_like(i_ref, -1)

    f = f_ref[...]                                             # [16, TILE_R]
    d = f[0:3, :]
    o = f[6:9, :]
    # slab test (branchless, inf-safe): per-axis entry/exit
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    lo = (aabb_ref[j, 0:3][:, None] - o) * inv                 # [3, TILE_R]
    hi = (aabb_ref[j, 3:6][:, None] - o) * inv
    t_near = jnp.max(jnp.minimum(lo, hi), axis=0, keepdims=True)
    t_far = jnp.min(jnp.maximum(lo, hi), axis=0, keepdims=True)
    if has_limit:
        t_lim = lim_ref[...]                                   # [1, TILE_R]
        limit = jnp.minimum(t_ref[...], t_lim)
    else:
        t_lim = None
        limit = t_ref[...]
    reach = (t_far >= 0.0) & (t_near <= t_far) & (t_near <= limit)

    @pl.when(jnp.any(reach))
    def _eval():
        _tile_body(g_ref, f, t_ref, i_ref, j, block_tris, precision, t_lim)


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _tile_aabbs(tris: TriangleSoA, t_pad: int, block_tris: int) -> jax.Array:
    """Conservative AABB per triangle tile, f32[nTiles, 8]; padding rows are
    excluded so empty tiles collapse to an unhittable inverted box."""
    v0 = jax.lax.stop_gradient(tris.v0)
    e1 = jax.lax.stop_gradient(tris.e1)
    e2 = jax.lax.stop_gradient(tris.e2)
    real = (jnp.arange(v0.shape[0]) < tris.num_triangles)[:, None]
    pts = jnp.stack([v0, v0 + e1, v0 + e2], axis=1)            # [T, 3, 3]
    lo = jnp.where(real[:, None], pts, jnp.inf).min(axis=1)    # [T, 3]
    hi = jnp.where(real[:, None], pts, -jnp.inf).max(axis=1)
    if t_pad > v0.shape[0]:
        pad = t_pad - v0.shape[0]
        lo = jnp.concatenate([lo, jnp.full((pad, 3), jnp.inf)])
        hi = jnp.concatenate([hi, jnp.full((pad, 3), -jnp.inf)])
    n_tiles = t_pad // block_tris
    lo_t = lo.reshape(n_tiles, block_tris, 3).min(axis=1)
    hi_t = hi.reshape(n_tiles, block_tris, 3).max(axis=1)
    return jnp.concatenate(
        [lo_t, hi_t, jnp.zeros((n_tiles, 2), jnp.float32)], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("block_rays", "block_tris", "interpret",
                                    "precision", "cull", "has_t_max"))
def _pallas_intersect_impl(o, d, tris, t_max, block_rays, block_tris,
                           interpret, precision, cull, has_t_max):
    R = o.shape[0]
    t_total = tris.v0.shape[0]
    block_tris = min(block_tris, _round_up(t_total, 128))
    r_pad = _round_up(max(R, block_rays), block_rays)
    t_pad = _round_up(t_total, block_tris)

    g = _triangle_matrices(tris)
    if t_pad > t_total:
        g = jnp.pad(g, ((0, 0), (0, t_pad - t_total), (0, 0)))
    f = _ray_features(o, d, r_pad)

    grid = (r_pad // block_rays, t_pad // block_tris)
    g_spec = pl.BlockSpec((4, block_tris, _NFEAT), lambda i, j: (0, j, 0),
                          memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((_NFEAT, block_rays), lambda i, j: (0, i),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_rays), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    out_specs = [row_spec, row_spec]
    out_shape = [jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
                 jax.ShapeDtypeStruct((1, r_pad), jnp.int32)]

    if cull:
        aabbs = _tile_aabbs(tris, t_pad, block_tris)
        lim = jnp.full((1, r_pad), np.float32(T_MAX), jnp.float32)
        if has_t_max:
            tm = jnp.broadcast_to(
                jax.lax.stop_gradient(jnp.asarray(t_max, jnp.float32)),
                (R,))
            lim = lim.at[0, :R].set(tm)
        kern = functools.partial(_kernel_culled, block_tris=block_tris,
                                 precision=_PRECISIONS[precision],
                                 has_limit=has_t_max)
        t_out, i_out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # aabbs (small, whole)
                g_spec, f_spec, row_spec,
            ],
            out_specs=out_specs, out_shape=out_shape,
            interpret=interpret,
        )(aabbs, g, f, lim)
    else:
        kern = functools.partial(_kernel, block_tris=block_tris,
                                 precision=_PRECISIONS[precision])
        t_out, i_out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[g_spec, f_spec],
            out_specs=out_specs, out_shape=out_shape,
            interpret=interpret,
        )(g, f)
        if has_t_max:
            tm = jnp.broadcast_to(
                jax.lax.stop_gradient(jnp.asarray(t_max, jnp.float32)), (R,))
            within = t_out[0, :R] <= tm
            return (jnp.where(within, t_out[0, :R], jnp.inf),
                    jnp.where(within, i_out[0, :R], -1))
    return t_out[0, :R], i_out[0, :R]


def pallas_intersect(o: jax.Array, d: jax.Array, tris: TriangleSoA,
                     block_rays: int = 1024, block_tris: int = 256,
                     interpret: bool = False, precision: str = "highest",
                     t_max=None, cull: Optional[bool] = None
                     ) -> Tuple[jax.Array, jax.Array]:
    """Nearest hit of rays (o, d) f32[R,3] against the scene; returns
    (t f32[R] (+inf miss), idx i32[R] (-1 miss)) with the same semantics as
    :func:`hermespy_rt_tpu.ops.intersect.intersect_jnp`.

    ``precision``: MXU contraction precision — "high" (bf16x3, ~f32-faithful,
    2x faster; decisions may flip at f32 edge cases) or "highest" (exact
    f32).  ``t_max`` (scalar or f32[R]) restricts the query to hits with
    ``t <= t_max`` — range-limited occlusion queries.  ``cull`` enables
    per-tile AABB skipping (default: on when the scene spans multiple
    triangle tiles).
    """
    if cull is None:
        # tile-level AABB culling only pays for coherent ray sets; callers
        # that know their rays are coherent (shadow bundles to one RX,
        # range-limited occlusion) opt in explicitly.
        cull = False
    return _pallas_intersect_impl(
        o, d, tris,
        jnp.zeros((), jnp.float32) if t_max is None else t_max,
        block_rays, block_tris, interpret, precision, bool(cull),
        t_max is not None)


def make_pallas_intersect(tris: TriangleSoA, block_rays: int = 1024,
                          block_tris: int = 256, interpret=None,
                          precision: str = "highest", cull=None):
    """Bind a scene into an ``intersect_fn(o, d, t_max=None) -> (t, idx)``
    closure.

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same code
    path runs in CPU tests (SURVEY.md §5: interpret mode as the kernel
    "sanitizer").
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def intersect_fn(o, d, t_max=None):
        return pallas_intersect(o, d, tris, block_rays=block_rays,
                                block_tris=block_tris, interpret=interpret,
                                precision=precision, t_max=t_max, cull=cull)

    return intersect_fn
