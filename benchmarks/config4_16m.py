#!/usr/bin/env python
"""BASELINE config-4 scale artifact (VERDICT r4 item 8): one 16M-ray
street-canyon trace on the chip — fwd+bwd training step at the bench
flags, scan-mode bounce loop (graph stays small), keep_rays off.  Reports
rays/s, Mq/s and peak device HBM.  Writes
benchmarks/logs/config4_r5.json."""
import json
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hermespy_rt_tpu.scene import load_hrt, flatten_scene
from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.tracer import trace_paths
import warnings
warnings.filterwarnings("ignore")

P = 1 << 24          # 16,777,216 rays
B = 3
scene = load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt")
tris = flatten_scene(scene, sort_triangles="morton")
mats = default_materials()
rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
z1 = jnp.zeros((1, 3), jnp.float32)

cfg = TracerConfig(num_paths=P, num_bounces=B, backend="auto",
                   keep_rays=False, precision="exact1",
                   unroll_bounces=False, scan_remat="save_all", fuse4=True,
                   compact_rays=True, launch_order="coherent",
                   grad_geometry=False, grad_positions=False,
                   gather="onehot_pallas", fetch_bwd="xla", shade="fused")


def loss_fn(m):
    r = trace_paths(tris, m, rx, tx, z1, z1, jnp.float32(3.0), cfg)
    return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
            + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9


step = jax.jit(jax.value_and_grad(loss_fn))
t0 = time.perf_counter()
out = step(mats); jax.block_until_ready(out)
compile_s = time.perf_counter() - t0
print(f"compile+1st {compile_s:.1f}s loss={float(out[0]):.6e}", flush=True)

iters = 4
t0 = time.perf_counter()
for _ in range(iters):
    out = step(mats)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / iters

stats = jax.local_devices()[0].memory_stats() or {}
peak = stats.get("peak_bytes_in_use", 0)
q = B * P * 2
res = {
    "scene": "simple_street_canyon_with_cars (234 tris)",
    "num_paths": P, "num_bounces": B, "mode": "scan fwd+bwd, bench flags",
    "wall_ms": dt * 1e3,
    "rays_per_s": P / dt,
    "mq_per_s": q / dt / 1e6,
    "peak_hbm_gib": peak / (1 << 30),
    "compile_s": compile_s,
    "loss": float(out[0]),
}
print(json.dumps(res, indent=1), flush=True)
with open("/root/repo/benchmarks/logs/config4_r5.json", "w") as f:
    json.dump(res, f, indent=1)
