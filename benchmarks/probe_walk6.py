#!/usr/bin/env python
"""Probe 6: reproduce the walk-kernel Mosaic compile failure on the soup
(probe_walk5: 'Slice shape along dimension 2 must be al...') with the FULL
error, and bisect which ingredient triggers it (scene size, f expansion)."""
import os, sys, time, traceback
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from hermespy_rt_tpu.scene import load_hrt, flatten_scene, random_soup_scene
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"
P = 1 << 16   # small ray count: we only need the compile outcome

d_b = jnp.asarray(fibonacci_sphere(P))
o0 = jnp.zeros((P, 3), jnp.float32)


def try_walk(tag, soa, br, bt, precision):
    try:
        f = jax.jit(lambda o, d: pallas_intersect(
            o, d, soa, block_rays=br, block_tris=bt, precision=precision,
            walk=True))
        t0 = time.perf_counter()
        out = f(o0, d_b)
        jax.block_until_ready(out)
        print(f"{tag}: OK compile {time.perf_counter()-t0:.1f}s", flush=True)
        return out
    except Exception:
        print(f"{tag}: FAIL", flush=True)
        tb = traceback.format_exc()
        # print the mosaic error lines in full
        for line in tb.split("\n"):
            if any(k in line for k in ("Mosaic", "Slice", "align",
                                       "divisible", "INTERNAL", "dimension")):
                print("   ", line.strip()[:500], flush=True)
        return None


# canyon first (small, worked as walk2 in probe4 at bt<=128)
tris = flatten_scene(load_hrt(CANYON))
try_walk("canyon walk exact1 br=1024 bt=128", tris, 1024, 128, "exact1")

# soup at two sizes
for ntri in (8192, 131072):
    soup = flatten_scene(random_soup_scene(ntri, seed=0, extent=400.0,
                                           tri_size=4.0), sort_triangles=True)
    try_walk(f"soup{ntri} walk exact1 br=1024 bt=256", soup, 1024, 256,
             "exact1")
    try_walk(f"soup{ntri} walk highest br=1024 bt=256", soup, 1024, 256,
             "highest")
print("done", flush=True)
