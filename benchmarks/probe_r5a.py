#!/usr/bin/env python
"""Probe r5a: close the 259 -> 336 Mq/s epilogue gap (VERDICT r4 item 1c).

probe_r4f measured the MXU floor (fused dots + div + one row-min) at
3.122 ms per 1M-query call; the shipping exact1+fuse4+interleave kernel
runs 4.04 ms (probe_r4g).  The gap is pure VPU epilogue.  The interleave
already overlays MXU and VPU for 2 lane sub-tiles; this probe sweeps the
(block_rays, halves) grid to find how much deeper the overlay pays, and
re-checks decisions are bit-identical across variants (they partition
lanes only — each element's compute path is unchanged).
"""
import functools
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.ops import intersect_pallas as ip
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere
import warnings
warnings.filterwarnings("ignore")

scene = load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt")
tris = flatten_scene(scene, sort_triangles="morton")
R = 1 << 20

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
    return dt, out


ref_t = ref_i = None
for br, hv in ((1024, 2), (1024, 4), (2048, 2), (2048, 4), (2048, 8),
               (4096, 4), (4096, 8), (4096, 16), (1024, 1)):
    f = jax.jit(functools.partial(ip.pallas_intersect, o, d, tris,
                                  precision="exact1", fuse4=True,
                                  block_rays=br, interleave=hv))
    dt, (t, i) = bench(f"exact1 br={br} hv={hv}", f)
    if ref_t is None:
        ref_t, ref_i = np.asarray(t), np.asarray(i)
    else:
        flips = int((np.asarray(i) != ref_i).sum())
        dtv = float(np.abs(np.nan_to_num(np.asarray(t), posinf=0)
                           - np.nan_to_num(ref_t, posinf=0)).max())
        print(f"  vs baseline: idx flips={flips} max|dt|={dtv:.3e}",
              flush=True)
print("done", flush=True)
