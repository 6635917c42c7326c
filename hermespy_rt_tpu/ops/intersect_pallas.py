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


def _tri_derived(tris: TriangleSoA, center=None):
    v0 = jax.lax.stop_gradient(tris.v0)
    e1 = jax.lax.stop_gradient(tris.e1)
    e2 = jax.lax.stop_gradient(tris.e2)
    if center is not None:
        v0 = v0 - center[None, :]
    nun = jnp.cross(e1, e2)                        # [T, 3]
    c_u = jnp.cross(e2, v0)
    c_v = jnp.cross(v0, e1)
    k = jnp.sum(v0 * nun, axis=-1, keepdims=True)  # [T, 1]
    return v0, e1, e2, nun, c_u, c_v, k


def _triangle_matrices(tris: TriangleSoA, center=None) -> jax.Array:
    """Per-triangle contraction matrices G f32[4, Tpad, 16] (det, u, v, t rows)
    for the MXU variant.  Computed from the SoA each call (O(T), fuses into
    the surrounding jit) and explicitly non-differentiable: hit decisions are
    piecewise constant.
    """
    v0, e1, e2, nun, c_u, c_v, k = _tri_derived(tris, center)
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


def _ray_features(o: jax.Array, d: jax.Array, r_pad: int,
                  center=None) -> jax.Array:
    """Ray feature matrix F f32[16, Rpad]: rows d, m = o x d, o, 1, padding."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    if center is not None:
        o = o - center[None, :]
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


def _split3_bf16(x):
    """f32 -> (h1, h2, h3) bf16 triple with h1+h2+h3 == x exactly (a 24-bit
    mantissa splits exactly into three 8-bit bf16 limbs).

    This split runs OUTSIDE the Pallas kernel (the exact1 G/F expansion), in
    XLA land, where ``--xla_allow_excess_precision=true`` (set by this repo's
    TPU terminal) licenses XLA to elide ``convert_f32(convert_bf16(x))``
    round-trips — which would turn the residuals into zeros and silently
    collapse exact1 to single-bf16 accuracy.  The optimization barriers pin
    the rounded values (found the hard way: benchmarks/logs/probe_walk3.log).
    The in-kernel :func:`_split_bf16` needs no barrier (Mosaic does not
    apply that rewrite)."""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - jax.lax.optimization_barrier(h1).astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - jax.lax.optimization_barrier(h2).astype(jnp.float32)
          ).astype(jnp.bfloat16)
    return h1, h2, h3


# K-axis limb expansion for the "exact1" mode: the MXU pads the contraction
# dimension 16 -> 128 regardless, so instead of paying extra *passes* for f32
# precision (XLA HIGHEST = 6 bf16 passes), spend the free K lanes.  Each of
# the 16 base feature columns becomes 8 columns carrying the (G limb i,
# F limb j) combinations below; one native-bf16 [T,128]@[128,R] pass then
# accumulates every limb product >= 2^-24 relative in f32 — the same error
# bound as an exact f32 contraction (only the 2^-32 (h3,h3) term is dropped),
# at 1/6 of the HIGHEST MXU work.
_EXACT1_COMBOS = ((0, 0), (0, 1), (1, 0), (0, 2), (2, 0), (1, 1),
                  (1, 2), (2, 1))
_NFEAT_EXACT1 = _NFEAT * len(_EXACT1_COMBOS)  # = 128


def _split3_bf16_kernel(x):
    """In-kernel (Mosaic) 3-limb split — no optimization barriers needed:
    Mosaic does not apply XLA's excess-precision convert-elision rewrite
    (validated on TPU: zero exact1-vs-highest decision flips on 1M bounce
    rays, benchmarks/logs/probe_walk4.log)."""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    return h1, h2, h3


def _expand_g_exact1(g: jax.Array) -> jax.Array:
    """[4, T, 16] f32 -> [4, T, 128] bf16 (G limb per combo slot).  Runs
    INSIDE the kernel: the operands cross HBM as compact f32 and the limb
    expansion costs VPU-only work in VMEM (doing it in XLA land materialises
    ~GB-scale barrier-pinned intermediates, measured +3.5 ms per 1M-query
    call)."""
    limbs = _split3_bf16_kernel(g)
    return jnp.concatenate([limbs[i] for i, _ in _EXACT1_COMBOS], axis=-1)


def _expand_f_exact1(f: jax.Array) -> jax.Array:
    """[16, R] f32 -> [128, R] bf16 (F limb per combo slot); in-kernel."""
    limbs = _split3_bf16_kernel(f)
    return jnp.concatenate([limbs[j] for _, j in _EXACT1_COMBOS], axis=0)


def _mt_terms_mxu(g_ref, f, precision):
    """det/u/v/t for the tile via 4 [TILE_T,16]@[16,TILE_R] MXU contractions.

    ``precision`` selects the MXU strategy:

    * ``"highest"`` — exact f32 (XLA's 6-bf16-pass decomposition).
    * ``"bf16x2"`` — both operands split into two bf16 limbs (``g = gh + gl``
      up to a ~2^-16 representation residual) and the FULL four-term product
      ``gh@fh + gh@fl + gl@fh + gl@fl`` evaluated — 4 native-bf16 passes.
      Because all cross terms are kept, this is *exact* (to f32 accumulation,
      same as "highest") arithmetic on the limb-rounded operands: the result
      equals an exact trace of a scene whose G/F entries moved by ≤ 2^-16
      relative.  Decisions are self-consistent; flips vs "highest" need a ray
      genuinely within the perturbation of a triangle edge.  ~1.5x "highest".
    * ``"high"`` — bf16x3: drops the ``gl@fl`` term (3 passes, fastest).  The
      dropped term is a true arithmetic error (~2^-16 of the term magnitude
      sum), which cancellation can amplify — epsilon-edge decisions flip more
      often than bf16x2.  Opt-in only.
    """
    if precision == "highest":
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        return (dot(g_ref[0], f), dot(g_ref[1], f), dot(g_ref[2], f),
                dot(g_ref[3], f))

    if precision == "exact1":
        # expand f32 operands to bf16 K-limb columns in VMEM: one native
        # pass per quantity IS the full-precision contraction.  The walk
        # kernel hands G pre-expanded (bf16, 128 lanes — its manual HBM DMA
        # needs lane-128 slices); the grid kernels expand in-kernel.
        g = g_ref[...]
        ge = g if g.dtype == jnp.bfloat16 else _expand_g_exact1(g)
        fe = _expand_f_exact1(f) if f.shape[0] != _NFEAT_EXACT1 else f
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        return (dot(ge[0], fe), dot(ge[1], fe), dot(ge[2], fe),
                dot(ge[3], fe))

    fh, fl = _split_bf16(f)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)

    if precision == "bf16x2":
        def dot4x(g):
            gh, gl = _split_bf16(g)
            return (dot(gh, fh) + dot(gl, fl)) + (dot(gh, fl) + dot(gl, fh))
        return (dot4x(g_ref[0]), dot4x(g_ref[1]), dot4x(g_ref[2]),
                dot4x(g_ref[3]))

    def dot3x(g):
        gh, gl = _split_bf16(g)
        return dot(gh, fh) + (dot(gh, fl) + dot(gl, fh))

    return (dot3x(g_ref[0]), dot3x(g_ref[1]), dot3x(g_ref[2]),
            dot3x(g_ref[3]))


def _tile_body(g_ref, f, excl, t_ref, i_ref, j, block_tris, precision,
               t_lim):
    det, u_num, v_num, t_num = _mt_terms_mxu(g_ref, f, precision)
    inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    rows = jax.lax.broadcasted_iota(jnp.int32, det.shape, 0)
    valid = ((jnp.abs(det) >= FLT_EPS)
             & (u >= -FLT_EPS) & (u <= 1.0 + FLT_EPS)
             & (v >= -FLT_EPS) & (u + v <= 1.0 + FLT_EPS)
             & (t > FLT_EPS) & (t < T_MAX)
             # per-ray excluded triangle (self-hit suppression: the caller
             # knows the ray originates ON this triangle)
             & (rows != excl - j * block_tris))
    if t_lim is not None:
        valid = valid & (t <= t_lim)
    t_m = jnp.where(valid, t, _BIG)

    tile_min = jnp.min(t_m, axis=0, keepdims=True)             # [1, TILE_R]
    tile_arg = jnp.min(
        jnp.where((t_m == tile_min) & valid, rows, jnp.int32(2**31 - 1)),
        axis=0, keepdims=True)                                 # first-min rows
    tile_idx = tile_arg + j * block_tris

    best_t = t_ref[...]
    improve = tile_min < best_t                                # strict: ties
    t_ref[...] = jnp.where(improve, tile_min, best_t)          # keep earlier
    i_ref[...] = jnp.where(improve, tile_idx, i_ref[...])


def _kernel(g_ref, f_ref, ex_ref, t_ref, i_ref, *, block_tris: int,
            precision):
    """One (ray-tile, tri-tile) step of the nearest-hit reduction."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_ref[...] = jnp.full_like(t_ref, _BIG)
        i_ref[...] = jnp.full_like(i_ref, -1)

    _tile_body(g_ref, f_ref[...], ex_ref[...], t_ref, i_ref, j, block_tris,
               precision, None)


def _kernel_culled(aabb_ref, g_ref, f_ref, od_ref, ex_ref, lim_ref, t_ref,
                   i_ref, *, block_tris: int, precision, has_limit: bool):
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

    f = f_ref[...]                                      # [NFEAT, TILE_R]
    od = od_ref[...]                                     # f32 [8, TILE_R]
    d = od[0:3, :]
    o = od[3:6, :]
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
    # limit < 0 marks rays whose query is void (dead rays under compaction:
    # t_max = -1); without the explicit limit >= 0 term a stale origin
    # inside the scene AABB (t_near very negative) would still "reach".
    reach = ((t_far >= 0.0) & (t_near <= t_far) & (t_near <= limit)
             & (limit >= 0.0))

    @pl.when(jnp.any(reach))
    def _eval():
        _tile_body(g_ref, f, ex_ref[...], t_ref, i_ref, j, block_tris,
                   precision, t_lim)


def _tile_body_walk(g_ref, f, excl, t_ref, i_ref, j, block_tris, precision,
                    t_lim):
    """Tile evaluation for the out-of-order walk: like :func:`_tile_body` but
    ``j`` is the *actual* (prefetched) tile id and the running-min update
    breaks exact-t ties toward the lower triangle index, reproducing the
    reference's first-strict-min file-order semantics
    (/root/reference/src/compute_paths.c:275-284) under any visit order."""
    det, u_num, v_num, t_num = _mt_terms_mxu(g_ref, f, precision)
    inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    rows = jax.lax.broadcasted_iota(jnp.int32, det.shape, 0)
    valid = ((jnp.abs(det) >= FLT_EPS)
             & (u >= -FLT_EPS) & (u <= 1.0 + FLT_EPS)
             & (v >= -FLT_EPS) & (u + v <= 1.0 + FLT_EPS)
             & (t > FLT_EPS) & (t < T_MAX)
             & (rows != excl - j * block_tris))
    if t_lim is not None:
        valid = valid & (t <= t_lim)
    t_m = jnp.where(valid, t, _BIG)

    tile_min = jnp.min(t_m, axis=0, keepdims=True)             # [1, TILE_R]
    tile_arg = jnp.min(
        jnp.where((t_m == tile_min) & valid, rows, jnp.int32(2**31 - 1)),
        axis=0, keepdims=True)
    hit = tile_min < _BIG
    tile_idx = jnp.where(hit, tile_arg + j * block_tris, jnp.int32(2**31 - 1))

    best_t = t_ref[...]
    best_i = i_ref[...]
    improve = (tile_min < best_t) | (hit & (tile_min == best_t)
                                     & (tile_idx < best_i))
    t_ref[...] = jnp.where(improve, tile_min, best_t)
    i_ref[...] = jnp.where(improve, tile_idx, best_i)


def _kernel_walk_res(visit_ref, aabb_ref, g_ref, f_ref, od_ref,
                     ex_ref, lim_ref, t_ref, i_ref, *,
                     block_tris: int, precision, has_limit: bool):
    """VMEM-resident visit-list walk for small scenes (grid = (nRT,)).

    Same semantics as :func:`_kernel_walk` but the whole (pre-expanded) G
    array lives in VMEM, so visited tiles are plain dynamic slices — no
    manual DMA, no double buffer, no scratch.  For the 256-padded-triangle
    canyon the expanded G is 256 KB; anything up to a few thousand triangles
    fits comfortably, and the per-ray-tile near-to-far early-out (running
    ``best_t`` against each tile's conservative entry distance) prunes most
    tile evaluations — the reference's brute-force scan
    (/root/reference/src/compute_paths.c:253-255) becomes output-sensitive.
    """
    t_ref[...] = jnp.full_like(t_ref, _BIG)
    i_ref[...] = jnp.full_like(i_ref, jnp.int32(2**31 - 1))
    row = jax.lax.rem(pl.program_id(0), 8)
    n = visit_ref[row, 0]

    f = f_ref[...]
    od = od_ref[...]
    d = od[0:3, :]
    o = od[3:6, :]
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    excl = ex_ref[...]
    t_lim = lim_ref[...] if has_limit else None

    def body(k, _):
        j = visit_ref[row, k + 1]
        lo = (aabb_ref[j, 0:3][:, None] - o) * inv
        hi = (aabb_ref[j, 3:6][:, None] - o) * inv
        t_near = jnp.max(jnp.minimum(lo, hi), axis=0, keepdims=True)
        t_far = jnp.min(jnp.maximum(lo, hi), axis=0, keepdims=True)
        if has_limit:
            limit = jnp.minimum(t_ref[...], t_lim)
        else:
            limit = t_ref[...]
        reach = ((t_far >= 0.0) & (t_near <= t_far) & (t_near <= limit)
                 & (limit >= 0.0))

        @pl.when(jnp.any(reach))
        def _eval():
            g_tile = g_ref[:, pl.ds(j * block_tris, block_tris), :]
            _tile_body_walk(g_tile, f, excl, t_ref, i_ref, j,
                            block_tris, precision, t_lim)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _kernel_walk(visit_ref, aabb_ref, g_hbm, f_ref, od_ref,
                 ex_ref, lim_ref, t_ref, i_ref, g_buf, sem, *,
                 block_tris: int, precision, has_limit: bool):
    """Visit-list walk, one grid step per RAY tile (grid = (nRT,)).

    ``visit_ref`` (SMEM, [8, C] rows of 8 consecutive ray tiles; col 0 is the
    count, cols 1.. the visit list) names this ray tile's conservatively
    reachable triangle tiles nearest-first; the kernel fori-loops over them,
    double-buffering each G tile from HBM by hand (``g_buf``/``sem``) so
    unreachable tiles are neither DMA'd nor evaluated.  Because tiles arrive
    near-to-far, the running ``best_t`` tightens fast and the per-tile reach
    test skips most later tiles — the TPU-native answer to the reference's
    ``TODO BVH`` (/root/reference/src/compute_paths.c:246).

    (A first design used scalar-prefetched BlockSpec indices over a
    (ray tiles x visit slots) grid; Mosaic spends ~0.5-1 KB of SMEM per grid
    step on such grids and dies above ~1024 steps — benchmarks/probe_walk2.
    The fori form keeps the grid at nRT steps and has no such limit.)"""

    t_ref[...] = jnp.full_like(t_ref, _BIG)
    i_ref[...] = jnp.full_like(i_ref, jnp.int32(2**31 - 1))
    row = jax.lax.rem(pl.program_id(0), 8)
    n = visit_ref[row, 0]

    def get_dma(slot, k):
        j = visit_ref[row, k + 1]
        return pltpu.make_async_copy(
            g_hbm.at[:, pl.ds(j * block_tris, block_tris), :],
            g_buf.at[slot], sem.at[slot])

    @pl.when(n > 0)
    def _warmup():
        get_dma(0, 0).start()

    f = f_ref[...]
    od = od_ref[...]
    d = od[0:3, :]
    o = od[3:6, :]
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    excl = ex_ref[...]
    t_lim = lim_ref[...] if has_limit else None

    def body(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n)
        def _prefetch():
            get_dma(jax.lax.rem(k + 1, 2), k + 1).start()

        get_dma(slot, k).wait()
        j = visit_ref[row, k + 1]
        lo = (aabb_ref[j, 0:3][:, None] - o) * inv
        hi = (aabb_ref[j, 3:6][:, None] - o) * inv
        t_near = jnp.max(jnp.minimum(lo, hi), axis=0, keepdims=True)
        t_far = jnp.min(jnp.maximum(lo, hi), axis=0, keepdims=True)
        if has_limit:
            limit = jnp.minimum(t_ref[...], t_lim)
        else:
            limit = t_ref[...]
        reach = ((t_far >= 0.0) & (t_near <= t_far) & (t_near <= limit)
                 & (limit >= 0.0))

        @pl.when(jnp.any(reach))
        def _eval():
            _tile_body_walk(g_buf[slot], f, excl, t_ref, i_ref, j,
                            block_tris, precision, t_lim)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _walk_prepass(od, lim, aabbs, block_rays: int, tile_chunk: int = 32):
    """Per-ray-tile visit lists for the walk kernel (all jnp, fwd-only).

    Returns ``visit`` i32[nRT, nTT] (reachable tiles first, sorted by their
    nearest conservative entry distance; padding slots repeat the last entry
    so the pipeline never re-DMAs) and ``count`` i32[nRT, 1].
    """
    r_pad = od.shape[1]
    n_rt = r_pad // block_rays
    n_tt = aabbs.shape[0]
    d = od[0:3, :].reshape(3, n_rt, block_rays)
    o = od[3:6, :].reshape(3, n_rt, block_rays)
    lim_t = lim.reshape(n_rt, 1, block_rays)
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)

    def chunk_fn(ab):                                 # ab: [C, 8]
        lo = (ab[:, 0:3].T[:, None, :, None] - o[:, :, None, :]) * inv[:, :, None, :]
        hi = (ab[:, 3:6].T[:, None, :, None] - o[:, :, None, :]) * inv[:, :, None, :]
        # [3, nRT, C, block_rays]
        t_near = jnp.max(jnp.minimum(lo, hi), axis=0)          # [nRT, C, R_b]
        t_far = jnp.min(jnp.maximum(lo, hi), axis=0)
        reach_r = ((t_far >= 0.0) & (t_near <= t_far)
                   & (t_near <= lim_t) & (lim_t >= 0.0))
        key_r = jnp.where(reach_r, jnp.maximum(t_near, 0.0), jnp.inf)
        return jnp.any(reach_r, axis=-1), jnp.min(key_r, axis=-1)

    pad_tt = _round_up(n_tt, tile_chunk)
    ab_all = jnp.pad(aabbs, ((0, pad_tt - n_tt), (0, 0)))
    # padding boxes are all-zero -> lo==hi==(0-o)*inv; they may spuriously
    # "reach" only if a ray passes through the center point; mask them after.
    reach_c, key_c = jax.lax.map(
        chunk_fn, ab_all.reshape(pad_tt // tile_chunk, tile_chunk, 8))
    reach = jnp.moveaxis(reach_c, 0, 1).reshape(n_rt, pad_tt)[:, :n_tt]
    key = jnp.moveaxis(key_c, 0, 1).reshape(n_rt, pad_tt)[:, :n_tt]

    key = jnp.where(reach, key, jnp.inf)
    count = jnp.sum(reach, axis=1, dtype=jnp.int32)            # [nRT]
    order = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    kk = jnp.minimum(jax.lax.broadcasted_iota(jnp.int32, (n_rt, n_tt), 1),
                     jnp.maximum(count - 1, 0)[:, None])
    visit = jnp.take_along_axis(order, kk, axis=1)
    # one SMEM-friendly array: col 0 = count, cols 1.. = visit list; rows
    # padded to a multiple of 8 and cols to a multiple of 128 so the kernel
    # can read it through a (8, C) SMEM block
    c_pad = _round_up(1 + n_tt, 128)
    r8 = _round_up(n_rt, 8)
    packed = jnp.zeros((r8, c_pad), jnp.int32)
    packed = packed.at[:n_rt, 0].set(count)
    packed = packed.at[:n_rt, 1:1 + n_tt].set(visit)
    return packed


_PRECISIONS = ("highest", "exact1", "bf16x2", "high")


def _scene_center(tris: TriangleSoA) -> jax.Array:
    """AABB midpoint of the real (non-padding) triangles, f32[3].

    Used to re-center geometry and rays for the reduced-precision modes: the
    MT triple-product reformulation carries absolute coordinates into the
    contraction terms (m = o x d, c_u = e2 x v0, k = v0 . Nun), so term
    magnitudes — and hence the bf16-limb rounding error after cancellation —
    scale with the distance from the origin.  All four MT quantities are
    translation-invariant, so shifting both v0 and o by the scene center is
    free and cuts the error scale from |scene position| to |scene extent|.
    """
    v0 = jax.lax.stop_gradient(tris.v0)
    e1 = jax.lax.stop_gradient(tris.e1)
    e2 = jax.lax.stop_gradient(tris.e2)
    real = (jnp.arange(v0.shape[0]) < tris.num_triangles)[:, None, None]
    pts = jnp.stack([v0, v0 + e1, v0 + e2], axis=1)            # [T, 3, 3]
    lo = jnp.where(real, pts, jnp.inf).min(axis=(0, 1))        # [3]
    hi = jnp.where(real, pts, -jnp.inf).max(axis=(0, 1))
    c = 0.5 * (lo + hi)
    return jnp.where(jnp.isfinite(c), c, 0.0)


def _tile_aabbs(tris: TriangleSoA, t_pad: int, block_tris: int,
                center=None) -> jax.Array:
    """Conservative AABB per triangle tile, f32[nTiles, 8]; padding rows are
    excluded so empty tiles collapse to an unhittable inverted box."""
    v0 = jax.lax.stop_gradient(tris.v0)
    e1 = jax.lax.stop_gradient(tris.e1)
    e2 = jax.lax.stop_gradient(tris.e2)
    if center is not None:
        v0 = v0 - center[None, :]
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
                                    "precision", "cull", "has_t_max",
                                    "walk", "pre_expand"))
def _pallas_intersect_impl(o, d, tris, t_max, exclude, block_rays,
                           block_tris, interpret, precision, cull,
                           has_t_max, walk=False, pre_expand=False):
    R = o.shape[0]
    t_total = tris.v0.shape[0]
    block_tris = min(block_tris, _round_up(t_total, 128))
    r_pad = _round_up(max(R, block_rays), block_rays)
    t_pad = _round_up(t_total, block_tris)

    center = None if precision == "highest" else _scene_center(tris)
    g = _triangle_matrices(tris, center)
    if t_pad > t_total:
        g = jnp.pad(g, ((0, 0), (0, t_pad - t_total), (0, 0)))
    f = _ray_features(o, d, r_pad, center)
    # f32 (d, o) rows for the culled kernel's slab test, independent of the
    # (possibly bf16-limb-expanded) contraction operands
    od = jnp.concatenate([f[0:3], f[6:9], jnp.zeros((2, r_pad), jnp.float32)])
    ex = jnp.full((1, r_pad), -1, jnp.int32)
    if exclude is not None:
        ex = ex.at[0, :R].set(
            jax.lax.stop_gradient(jnp.asarray(exclude, jnp.int32)))
    # exact1 limb expansion happens INSIDE the kernel by default (operands
    # cross HBM compact); pre_expand moves it to XLA land (barriered split) —
    # ~256 MB/M-rays of extra bf16 HBM traffic buys back the per-tile VPU
    # expansion, a net win for single-tile scenes where every grid step pays
    # the in-kernel expansion exactly once per ray tile.
    if pre_expand and precision == "exact1" and not walk:
        limbs_g = _split3_bf16(g)
        g = jnp.concatenate([limbs_g[i] for i, _ in _EXACT1_COMBOS], axis=-1)
        limbs_f = _split3_bf16(f)
        f = jnp.concatenate([limbs_f[j] for _, j in _EXACT1_COMBOS], axis=0)
    nfeat = f.shape[0]

    grid = (r_pad // block_rays, t_pad // block_tris)
    g_spec = pl.BlockSpec((4, block_tris, nfeat), lambda i, j: (0, j, 0),
                          memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((nfeat, block_rays), lambda i, j: (0, i),
                          memory_space=pltpu.VMEM)
    od_spec = pl.BlockSpec((8, block_rays), lambda i, j: (0, i),
                           memory_space=pltpu.VMEM)
    ex_spec = pl.BlockSpec((1, block_rays), lambda i, j: (0, i),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_rays), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    out_specs = [row_spec, row_spec]
    out_shape = [jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
                 jax.ShapeDtypeStruct((1, r_pad), jnp.int32)]

    if walk:
        aabbs = _tile_aabbs(tris, t_pad, block_tris, center)
        lim = jnp.full((1, r_pad), np.float32(T_MAX), jnp.float32)
        if r_pad > R:
            # padding rays are all-zero (o = d = 0): void their queries so
            # the prepass never counts tiles for them
            lim = lim.at[0, R:].set(-1.0)
        if has_t_max:
            tm = jnp.broadcast_to(
                jax.lax.stop_gradient(jnp.asarray(t_max, jnp.float32)),
                (R,))
            lim = lim.at[0, :R].set(tm)
        visits = _walk_prepass(od, lim, aabbs, block_rays)
        # Both walk kernels take G and F pre-expanded: the DMA variant's
        # manual HBM->VMEM G copies need lane-128 slices (Mosaic DMA
        # alignment), and the fori-loop matmuls want layout-stable operands.
        # exact1 -> bf16 limb columns (barriered split per the
        # excess-precision hazard; G is T-sized and F R-sized — one extra
        # [128, R] bf16 pass of HBM traffic, ~0.3 ms/M rays), other
        # precisions -> f32 zero-padded K lanes (zero lanes contribute 0).
        if precision == "exact1":
            limbs_g = _split3_bf16(g)
            g = jnp.concatenate([limbs_g[i] for i, _ in _EXACT1_COMBOS],
                                axis=-1)
            limbs_f = _split3_bf16(f)
            f = jnp.concatenate([limbs_f[j] for _, j in _EXACT1_COMBOS],
                                axis=0)
        else:
            g = jnp.pad(g, ((0, 0), (0, 0), (0, 128 - g.shape[-1])))
            f = jnp.pad(f, ((0, 128 - f.shape[0]), (0, 0)))
        nfeat = f.shape[0]
        # resident variant: the whole expanded G fits VMEM for small scenes
        resident = walk == "resident" or (
            walk in (True, "auto")
            and 4 * t_pad * 128 * g.dtype.itemsize <= (4 << 20))
        row = lambda i: (0, i)
        common_in_specs = [
            pl.BlockSpec((8, visits.shape[1]), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),      # count+visit rows
            pl.BlockSpec(memory_space=pltpu.VMEM),      # aabbs
        ]
        tail_in_specs = [
            pl.BlockSpec((nfeat, block_rays), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_rays), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rays), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rays), row, memory_space=pltpu.VMEM),
        ]
        out_specs_walk = [
            pl.BlockSpec((1, block_rays), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rays), row, memory_space=pltpu.VMEM),
        ]
        if resident:
            kern = functools.partial(_kernel_walk_res, block_tris=block_tris,
                                     precision=precision,
                                     has_limit=has_t_max)
            t_out, i_out = pl.pallas_call(
                kern,
                grid=(r_pad // block_rays,),
                in_specs=common_in_specs
                + [pl.BlockSpec(memory_space=pltpu.VMEM)]   # G, whole
                + tail_in_specs,
                out_specs=out_specs_walk,
                out_shape=out_shape,
                interpret=interpret,
            )(visits, aabbs, g, f, od, ex, lim)
        else:
            kern = functools.partial(_kernel_walk, block_tris=block_tris,
                                     precision=precision,
                                     has_limit=has_t_max)
            t_out, i_out = pl.pallas_call(
                kern,
                grid=(r_pad // block_rays,),
                in_specs=common_in_specs
                + [pl.BlockSpec(memory_space=pltpu.ANY)]    # G (HBM)
                + tail_in_specs,
                out_specs=out_specs_walk,
                out_shape=out_shape,
                scratch_shapes=[
                    pltpu.VMEM((2, 4, block_tris, g.shape[-1]), g.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                interpret=interpret,
            )(visits, aabbs, g, f, od, ex, lim)
        t_r = t_out[0, :R]
        i_r = i_out[0, :R]
        return t_r, jnp.where(jnp.isfinite(t_r), i_r, -1)

    if cull:
        aabbs = _tile_aabbs(tris, t_pad, block_tris, center)
        lim = jnp.full((1, r_pad), np.float32(T_MAX), jnp.float32)
        if has_t_max:
            tm = jnp.broadcast_to(
                jax.lax.stop_gradient(jnp.asarray(t_max, jnp.float32)),
                (R,))
            lim = lim.at[0, :R].set(tm)
        kern = functools.partial(_kernel_culled, block_tris=block_tris,
                                 precision=precision, has_limit=has_t_max)
        t_out, i_out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # aabbs (small, whole)
                g_spec, f_spec, od_spec, ex_spec, row_spec,
            ],
            out_specs=out_specs, out_shape=out_shape,
            interpret=interpret,
        )(aabbs, g, f, od, ex, lim)
    else:
        kern = functools.partial(_kernel, block_tris=block_tris,
                                 precision=precision)
        t_out, i_out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[g_spec, f_spec, ex_spec],
            out_specs=out_specs, out_shape=out_shape,
            interpret=interpret,
        )(g, f, ex)
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
                     t_max=None, cull: Optional[bool] = None,
                     exclude=None,
                     walk=False,
                     pre_expand: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Nearest hit of rays (o, d) f32[R,3] against the scene; returns
    (t f32[R] (+inf miss), idx i32[R] (-1 miss)) with the same semantics as
    :func:`hermespy_rt_tpu.ops.intersect.intersect_jnp`.

    ``precision``: MXU contraction precision — "highest" (exact f32),
    "bf16x2" (exact product of two-limb-rounded, scene-centered operands;
    ~1.5x) or "high" (bf16x3; fastest, decisions may flip at f32 edge
    cases).  ``t_max`` (scalar or f32[R]) restricts the query to hits with
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
        exclude, block_rays, block_tris, interpret, precision, bool(cull),
        t_max is not None, walk=walk, pre_expand=pre_expand)


def make_pallas_intersect(tris: TriangleSoA, block_rays: int = 1024,
                          block_tris: int = 256, interpret=None,
                          precision: str = "highest", cull=None,
                          walk=False):
    """Bind a scene into an ``intersect_fn(o, d, t_max=None) -> (t, idx)``
    closure.

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same code
    path runs in CPU tests (SURVEY.md §5: interpret mode as the kernel
    "sanitizer").
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def intersect_fn(o, d, t_max=None, exclude=None):
        return pallas_intersect(o, d, tris, block_rays=block_rays,
                                block_tris=block_tris, interpret=interpret,
                                precision=precision, t_max=t_max, cull=cull,
                                exclude=exclude, walk=walk)

    return intersect_fn
