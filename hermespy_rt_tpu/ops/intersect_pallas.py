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
from typing import Tuple

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


def _triangle_matrices(tris: TriangleSoA) -> jax.Array:
    """Per-triangle contraction matrices G f32[4, Tpad, 16] (det, u, v, t rows).

    Computed from the SoA each call (O(T), fuses into the surrounding jit) and
    explicitly non-differentiable: hit decisions are piecewise constant.
    """
    v0 = jax.lax.stop_gradient(tris.v0)
    e1 = jax.lax.stop_gradient(tris.e1)
    e2 = jax.lax.stop_gradient(tris.e2)
    nun = jnp.cross(e1, e2)                        # [T, 3]
    c_u = jnp.cross(e2, v0)
    c_v = jnp.cross(v0, e1)
    k = jnp.sum(v0 * nun, axis=-1, keepdims=True)  # [T, 1]
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


def _kernel(g_ref, f_ref, t_ref, i_ref, *, block_tris: int):
    """One (ray-tile, tri-tile) step of the nearest-hit reduction."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_ref[...] = jnp.full_like(t_ref, _BIG)
        i_ref[...] = jnp.full_like(i_ref, -1)

    f = f_ref[...]                                 # [16, TILE_R]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    det = dot(g_ref[0], f)                         # [TILE_T, TILE_R]
    u_num = dot(g_ref[1], f)
    v_num = dot(g_ref[2], f)
    t_num = dot(g_ref[3], f)

    inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    valid = ((jnp.abs(det) >= FLT_EPS)
             & (u >= -FLT_EPS) & (u <= 1.0 + FLT_EPS)
             & (v >= -FLT_EPS) & (u + v <= 1.0 + FLT_EPS)
             & (t > FLT_EPS) & (t < T_MAX))
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


@functools.partial(jax.jit,
                   static_argnames=("block_rays", "block_tris", "interpret"))
def pallas_intersect(o: jax.Array, d: jax.Array, tris: TriangleSoA,
                     block_rays: int = 1024, block_tris: int = 256,
                     interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Nearest hit of rays (o, d) f32[R,3] against the scene; returns
    (t f32[R] (+inf miss), idx i32[R] (-1 miss)) with the same semantics as
    :func:`hermespy_rt_tpu.ops.intersect.intersect_jnp`.
    """
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
    t_out, i_out = pl.pallas_call(
        functools.partial(_kernel, block_tris=block_tris),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, block_tris, _NFEAT), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NFEAT, block_rays), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_rays), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rays), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ],
        interpret=interpret,
    )(g, f)
    return t_out[0, :R], i_out[0, :R]


def make_pallas_intersect(tris: TriangleSoA, block_rays: int = 1024,
                          block_tris: int = 256, interpret=None):
    """Bind a scene into an ``intersect_fn(o, d) -> (t, idx)`` closure.

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same code
    path runs in CPU tests (SURVEY.md §5: interpret mode as the kernel
    "sanitizer").
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def intersect_fn(o, d):
        return pallas_intersect(o, d, tris, block_rays=block_rays,
                                block_tris=block_tris, interpret=interpret)

    return intersect_fn
