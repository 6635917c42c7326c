#!/usr/bin/env python
"""Probe r4g: MXU/VPU overlap inside the intersect kernel.

r4f split the e2e 2.0 ms/call into ~0.7 ms MXU + ~1.1 ms epilogue (VPU) +
0.2 slack — the units run back-to-back, not overlapped.  Variants:

A. baseline exact1 fuse4 br=1024 (product kernel)
B. split-body br=2048: per grid step, TWO independent 1024-ray halves
   with program order dot_a, dot_b, epi_a, epi_b — dot_b has no
   dependency on epi_a, so Mosaic's VLIW scheduler may overlay the
   second half's MXU pass with the first half's VPU epilogue.
C. B with 4 x 512-ray slices (finer interleave).
All variants must return bit-identical (t, idx) to A.
"""
import functools
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.ops import intersect_pallas as ip
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere
from hermespy_rt_tpu.scene.model import _morton_order
import warnings
warnings.filterwarnings("ignore")

scene = load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt")
tris = flatten_scene(scene, sort_triangles="morton")
R = 1 << 20
dirs = np.asarray(fibonacci_sphere(R))
dirs = dirs[_morton_order(dirs)]
o = jnp.broadcast_to(jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32), (R, 3))
d = jnp.asarray(dirs, jnp.float32)

BT = 256


def _prep():
    center = ip._scene_center(tris)
    g = ip._triangle_matrices(tris, center)
    t_pad = ip._round_up(g.shape[1], BT)
    g = jnp.pad(g, ((0, 0), (0, t_pad - g.shape[1]), (0, 0)))
    limbs = ip._split3_bf16(g)
    g = jnp.concatenate([limbs[i] for i, _ in ip._EXACT1_COMBOS], axis=-1)
    od = ip._od_rows(o, d, R, center)
    return g, od, t_pad


def _epilogue(det, u_num, v_num, t_num, j, t_ref, i_ref, sl):
    from hermespy_rt_tpu.ops.intersect import FLT_EPS, T_MAX
    inv = 1.0 / det
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    rows = jax.lax.broadcasted_iota(jnp.int32, det.shape, 0)
    valid = ((jnp.abs(det) >= FLT_EPS)
             & (u >= -FLT_EPS) & (u <= 1.0 + FLT_EPS)
             & (v >= -FLT_EPS) & (u + v <= 1.0 + FLT_EPS)
             & (t > FLT_EPS) & (t < T_MAX))
    t_m = jnp.where(valid, t, 3.0e37)
    tile_min = jnp.min(t_m, axis=0, keepdims=True)
    tile_arg = jnp.min(jnp.where(t_m == tile_min, rows, jnp.int32(2**31 - 1)),
                       axis=0, keepdims=True)
    tile_idx = tile_arg + j * BT
    best_t = t_ref[0:1, sl]
    improve = tile_min < best_t
    t_ref[0:1, sl] = jnp.where(improve, tile_min, best_t)
    i_ref[0:1, sl] = jnp.where(improve, tile_idx, i_ref[0:1, sl])


def _kernel_split(g_ref, od_ref, t_ref, i_ref, *, halves, br):
    j = pl.program_id(1)
    sub = br // halves

    @pl.when(j == 0)
    def _init():
        t_ref[...] = jnp.full_like(t_ref, 3.0e37)
        i_ref[...] = jnp.full_like(i_ref, -1)

    # all dots first (independent), then the epilogues: Mosaic may overlay
    # half k+1's MXU pass with half k's VPU epilogue
    fs = [ip._features_from_od(od_ref[:, k * sub:(k + 1) * sub])
          for k in range(halves)]
    dots = [ip._mt_terms_mxu(g_ref, f, "exact1", True) for f in fs]
    for k in range(halves):
        _epilogue(*dots[k], j, t_ref, i_ref,
                  pl.dslice(k * sub, sub))


def call_split(br, halves):
    g, od, t_pad = _prep()
    grid = (R // br, t_pad // BT)
    return pl.pallas_call(
        functools.partial(_kernel_split, halves=halves, br=br),
        grid=grid,
        in_specs=[pl.BlockSpec((4, BT, g.shape[-1]), lambda i, j: (0, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, br), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, br), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, br), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, R), jnp.float32),
                   jax.ShapeDtypeStruct((1, R), jnp.int32)],
        compiler_params=ip._GRID_SEMANTICS,
    )(g, od)


def bench(tag, fn, iters=16):
    t0 = time.perf_counter()
    out = fn(); jax.block_until_ready(out)
    print(f"{tag}: compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:.3f} ms/call  {R/dt/1e6:.1f} Mray/s", flush=True)
    return out


base = bench("A exact1 fuse4 br=1024 (product)",
             jax.jit(functools.partial(ip.pallas_intersect, o, d, tris,
                                       precision="exact1", fuse4=True)))
tb, ib = np.asarray(base[0]), np.asarray(base[1])

for tag, br, hv in (("B split 2x1024", 2048, 2),
                    ("C split 4x512", 2048, 4),
                    ("D split 2x512", 1024, 2)):
    out = bench(tag, jax.jit(functools.partial(call_split, br, hv)))
    t2 = np.asarray(out[0])[0]
    i2 = np.asarray(out[1])[0]
    t2 = np.where(np.isfinite(tb), t2, np.inf)  # product maps miss->inf
    i2 = np.where(ib >= 0, i2, -1)
    print(f"{tag}: t equal={np.array_equal(np.nan_to_num(t2, posinf=1e38), np.nan_to_num(tb, posinf=1e38))} "
          f"idx equal={np.array_equal(i2, ib)}", flush=True)
