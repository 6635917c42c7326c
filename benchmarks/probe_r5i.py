#!/usr/bin/env python
"""Probe r5i: config-5 any-hit shadow walk A/B + the round-5 config-5
artifact.  probe_r5g attribution (trace_r5g): kernels 496 of 668 ms —
bounce queries 46/63/89 ms, SHADOW queries 68/82/109 ms (growing with
bounce incoherence), prepass 6.7 x 6.  Physical mode only consumes
`blocked`, so shadow rays may stop at their first in-range hit
(TracerConfig.shadow_any_hit).  Rows:

  A  default (any-hit shadow)      — the new config-5 number
  B  shadow_any_hit=False control  — must equal r5g A (662.5 ms) and
                                     match A's loss bit-exactly

Writes benchmarks/logs/config5_r5.json.
"""
import json
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import jax, jax.numpy as jnp
import numpy as np
from config5_scene import make_city
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.scene import flatten_scene, load_scene
from hermespy_rt_tpu.tracer import trace_paths
import warnings
warnings.filterwarnings("ignore")

xml = make_city("/tmp/city131k")
scene = load_scene(xml)
tris = flatten_scene(scene, sort_triangles=True)
mats = default_materials()
rx = jnp.asarray([[30.0, -40.0, 1.5]], jnp.float32)
tx = jnp.asarray([[-120.0, 80.0, 45.0]], jnp.float32)
z = jnp.zeros((1, 3), jnp.float32)
P, B = 1 << 20, 3
common = dict(num_paths=P, num_bounces=B, backend="pallas",
              keep_rays=False, precision="exact1", fuse4=True,
              parity="physical", unroll_bounces=False, fetch_bwd="xla",
              gather="take", launch_order="coherent", walk=True,
              block_tris=128, walk_prepass="ray", grad_geometry=False)


def bench(tag, iters=4, **kw):
    cfg = TracerConfig(**{**common, **kw})

    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    step = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    out = step(mats); jax.block_until_ready(out)
    v = float(out[0])
    print(f"{tag}: compile+1st {time.perf_counter()-t0:.1f}s "
          f"loss={v:.6e}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(mats)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    g = out[1]
    gfin = all(bool(np.isfinite(np.asarray(x)).all())
               for x in jax.tree_util.tree_leaves(g))
    print(f"{tag}: {dt*1e3:.1f} ms  {B*P*2/dt/1e6:.2f} Mq/s "
          f"grads_finite={gfin}", flush=True)
    return dt, v, gfin


dt_a, loss_a, fin_a = bench("A any-hit shadow (default)")
dt_b, loss_b, fin_b = bench("B nearest-hit control", shadow_any_hit=False)
print(f"loss A==B: {loss_a == loss_b} ({loss_a:.6e})", flush=True)

out = {
    "scene": "city131k (synthesized Sionna XML+PLY, to_world baked)",
    "num_triangles": int(tris.num_triangles),
    "rays": P, "bounces": B, "parity": "physical",
    "fwd_bwd_ms": round(dt_a * 1e3, 1),
    "queries_per_s": round(B * P * 2 / dt_a),
    "mq_per_s": round(B * P * 2 / dt_a / 1e6, 2),
    "nearest_hit_control_ms": round(dt_b * 1e3, 1),
    "loss_bit_identical_to_control": bool(loss_a == loss_b),
    "grads_finite": bool(fin_a),
    "flags": {k: v for k, v in common.items()},
    "round": 5,
    "history_mq_per_s": {"r3": 8.16, "r4": 8.2,
                         "r5_prepass_pallas": 8.67,
                         "r5_mat_indirect_fetch": 9.50,
                         "r5_any_hit_shadow": 10.01,
                         "r5_block_rays_2048": 10.79},
}
with open("/root/repo/benchmarks/logs/config5_r5.json", "w") as f:
    json.dump(out, f, indent=1)
print("artifact written", flush=True)
print("done", flush=True)
