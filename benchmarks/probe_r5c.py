#!/usr/bin/env python
"""Probe r5c: VPU layout efficiency of single-row ([1, B]) elementwise
chains inside Pallas kernels.

Hypothesis: the fused bounce kernels' per-ray state rows are [1, B] f32
(rays on lanes, ONE sublane) — if Mosaic assigns them a (8, 128)-tiled
layout with 7/8 sublanes dead, every chain op wastes 8x VPU throughput,
which would explain the slim backward kernels costing 1.34 ms each
(trace_r4e: more than the forwards they mirror) while their MXU work is
negligible.  Measured here: an identical 96-op mul/add/select chain over
1M elements shaped [1, 1M-lanes]-per-step vs [8, .../8] vs a [6, B] row
stack vs [6, 8, B/8] 3D.  If [8, x] runs ~8x faster per element, the r5
fix is to re-shape the fused kernels' row operands to (rows, 8, B/8).
"""
import functools
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import warnings
warnings.filterwarnings("ignore")

R = 1 << 20
OPS = 96


def chain(x):
    y = x
    for k in range(OPS // 3):
        y = y * jnp.float32(1.0000001) + jnp.float32(1e-9)
        y = jnp.where(y > 2.0, y - 1.0, y)
    return y


def kern(x_ref, o_ref):
    o_ref[...] = chain(x_ref[...])


def bench(tag, shape, block, iters=32):
    x = jnp.ones(shape, jnp.float32)
    grid = (int(np.prod(shape)) // int(np.prod(block)),)
    ix = lambda i: (0, i) if len(block) == 2 else (0, i, 0)
    f = jax.jit(lambda x: pl.pallas_call(
        kern, grid=grid,
        in_specs=[pl.BlockSpec(block, ix, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(block, ix, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x))
    out = f(x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    n = int(np.prod(shape))
    print(f"{tag}: {dt*1e3:.3f} ms  {n*OPS/dt/1e12:.3f} Tops/s", flush=True)
    return dt


# one logical "row" of R rays, processed 4096 lanes per grid step
bench("[1, R] rows, block (1, 4096)  (the fused-kernel layout)",
      (1, R), (1, 4096))
# same elements re-shaped onto sublanes
bench("[8, R/8], block (8, 512)", (8, R // 8), (8, 512))
# a 6-row state stack (st-like), block (6, 4096)
bench("[6, R] rows, block (6, 4096)", (6, R), (6, 4096))
# the 3D candidate layout: rows x sublanes x lanes
bench("[6, 8, R/8] 3D, block (6, 8, 512)", (6, 8, R // 8), (6, 8, 512))
bench("[1, 8, R/8] 3D, block (1, 8, 512)", (1, 8, R // 8), (1, 8, 512))
# wider lane blocks for the 1-row case (does lane count change it?)
bench("[1, R] rows, block (1, 32768)", (1, R), (1, 32768))
print("done", flush=True)
