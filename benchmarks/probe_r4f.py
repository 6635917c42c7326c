#!/usr/bin/env python
"""Probe r4f: intersect-kernel floor analysis on the canyon (VERDICT r3
next-round #2).

Questions, answered kernel-only (1M coherent bounce-like rays, 234-tri
canyon, bt=256 -> ONE triangle tile):

1. Is the kernel MXU-bound or epilogue(VPU)-bound?  A/B: exact1 (one
   K=128 pass) vs highest (6 bf16 passes -> 6x MXU work) vs bf16x2
   (4 K<=32 passes) vs an MXU-FLOOR kernel (same dots, epilogue replaced
   by one row-min).  If K<=128 contraction time is constant (systolic
   K padding), bf16x2/exact1 tie and two-stage K-thinning CANNOT pay —
   the round-2 "two-stage precision filter" lever is then provably dead
   on tile-granularity TPU kernels and the win must come from the
   epilogue instead.
2. Block-shape sensitivity: br 512/1024/2048 at bt=256.
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
import warnings
warnings.filterwarnings("ignore")

scene = load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt")
tris = flatten_scene(scene, sort_triangles="morton")
R = 1 << 20

# bounce-like rays: one origin, coherent fibonacci directions
from hermespy_rt_tpu.scene.model import _morton_order
dirs = np.asarray(fibonacci_sphere(R))
dirs = dirs[_morton_order(dirs)]
o = jnp.broadcast_to(jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32), (R, 3))
d = jnp.asarray(dirs, jnp.float32)


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
    return dt


for prec in ("exact1", "bf16x2", "high", "highest"):
    f = jax.jit(functools.partial(ip.pallas_intersect, o, d, tris,
                                  precision=prec, fuse4=(prec in
                                  ("exact1", "highest"))))
    bench(f"{prec} br=1024", f)

for br in (512, 2048):
    f = jax.jit(functools.partial(ip.pallas_intersect, o, d, tris,
                                  precision="exact1", fuse4=True,
                                  block_rays=br))
    bench(f"exact1 br={br}", f)


# ---- MXU-floor kernel: same operands, same fused dot, epilogue = one
# row-min of the raw t quotient (no validity chain, no argmin) ----
def _floor_kernel(g_ref, od_ref, t_ref, *, block_tris):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_ref[...] = jnp.full_like(t_ref, 3.0e37)

    f = ip._features_from_od(od_ref[...])
    det, u_num, v_num, t_num = ip._mt_terms_mxu(g_ref, f, "exact1", True)
    t = t_num / det
    t_ref[...] = jnp.minimum(t_ref[...], jnp.min(t, axis=0, keepdims=True))


def floor_call():
    center = ip._scene_center(tris)
    g = ip._triangle_matrices(tris, center)
    t_pad = ip._round_up(g.shape[1], 256)
    g = jnp.pad(g, ((0, 0), (0, t_pad - g.shape[1]), (0, 0)))
    limbs = ip._split3_bf16(g)
    g = jnp.concatenate([limbs[i] for i, _ in ip._EXACT1_COMBOS], axis=-1)
    od = ip._od_rows(o, d, R, center)
    grid = (R // 1024, t_pad // 256)
    return pl.pallas_call(
        functools.partial(_floor_kernel, block_tris=256),
        grid=grid,
        in_specs=[pl.BlockSpec((4, 256, g.shape[-1]), lambda i, j: (0, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 1024), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1024), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
        compiler_params=ip._GRID_SEMANTICS,
    )(g, od)


bench("MXU-floor (dots + row-min only)", jax.jit(floor_call))
