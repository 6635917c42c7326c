#!/usr/bin/env python
"""BASELINE config-5 end-to-end artifact (VERDICT r2 missing #2 / step #4).

Composes every large-scene ingredient into ONE run: the Sionna importer
(XML + PLY + to_world) on a synthesized 131,072-triangle city, Morton
triangle sort, the hierarchical visit-list walk kernel, coherent launch
order, and a full fwd+bwd trace with material + TX-position gradients on
the real chip.  A brute-force control run pins the speedup, and gradient
finiteness is asserted.  Results JSON: benchmarks/logs/config5_r3.json.

The virtual-8-device (rays, tris) mesh composition runs separately on CPU
(tests/test_config5.py + `--cpu-mesh` here) — one chip is all this
environment has (BASELINE multi-host efficiency stays unmeasurable; the
mechanism is tested).
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

CPU_MESH = "--cpu-mesh" in sys.argv
if CPU_MESH:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if CPU_MESH:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from config5_scene import make_city  # noqa: E402
from hermespy_rt_tpu.config import TracerConfig  # noqa: E402
from hermespy_rt_tpu.materials import default_materials  # noqa: E402
from hermespy_rt_tpu.scene import flatten_scene, load_scene  # noqa: E402
from hermespy_rt_tpu.tracer import trace_paths  # noqa: E402

OUT = "/root/repo/benchmarks/logs/config5_r3.json"


def grad_leaves(g):
    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(g)])


def main():
    xml = make_city("/tmp/city131k")
    scene = load_scene(xml)
    tris = flatten_scene(scene, sort_triangles=True)
    mats = default_materials()
    rx = jnp.asarray([[30.0, -40.0, 1.5]], jnp.float32)
    tx = jnp.asarray([[-120.0, 80.0, 45.0]], jnp.float32)
    z = jnp.zeros((1, 3), jnp.float32)
    res = {"scene": "city131k (synthesized Sionna XML+PLY, to_world baked)",
           "num_triangles": int(tris.num_triangles)}

    if CPU_MESH:
        # (rays, tris) virtual mesh composition, CPU; small shapes
        from hermespy_rt_tpu.parallel import default_mesh, \
            trace_paths_sharded
        P, B = 2048, 2
        cfg = TracerConfig(num_paths=P, num_bounces=B, backend="jnp",
                           keep_rays=False, parity="physical")
        mesh = default_mesh(num_ray_shards=4, num_tri_shards=2)

        def loss_fn(m, tx_):
            r = trace_paths_sharded(tris, m, rx, tx_, z, z,
                                    jnp.float32(3.0), cfg, mesh=mesh)
            return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                    + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
        step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
        t0 = time.perf_counter()
        v, g = step(mats, tx)
        jax.block_until_ready(v)
        wall = time.perf_counter() - t0
        gl = grad_leaves(g)
        res["cpu_mesh"] = {
            "mesh": "rays=4 x tris=2 (8 virtual CPU devices)",
            "P": P, "B": B, "loss": float(v),
            "wall_s_incl_compile": wall,
            "grads_finite": bool(np.isfinite(gl).all()),
            "grads_nonzero": bool((gl != 0).any()),
        }
    else:
        P, B = 1 << 20, 3
        common = dict(num_paths=P, num_bounces=B, backend="pallas",
                      keep_rays=False, precision="exact1", fuse4=True,
                      parity="physical", unroll_bounces=False,
                      fetch_bwd="xla", gather="take",
                      launch_order="coherent")
        cfg_walk = TracerConfig(walk=True, block_tris=128, **common)
        cfg_brute = TracerConfig(walk=False, **common)

        def make_step(cfg):
            def loss_fn(m, tx_):
                r = trace_paths(tris, m, rx, tx_, z, z, jnp.float32(3.0),
                                cfg)
                return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                        + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
            return jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))

        rows = {}
        for tag, cfg, iters in (("walk", cfg_walk, 4),
                                ("brute_control", cfg_brute, 1)):
            step = make_step(cfg)
            t0 = time.perf_counter()
            v, g = step(mats, tx)
            jax.block_until_ready(v)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(iters):
                v, g = step(mats, tx)
            jax.block_until_ready(v)
            wall = (time.perf_counter() - t0) / iters
            gl = grad_leaves(g)
            q = B * P * 2
            rows[tag] = {
                "wall_ms": wall * 1e3, "mqs": q / wall / 1e6,
                "compile_s": compile_s, "loss": float(v),
                "grads_finite": bool(np.isfinite(gl).all()),
                "grads_nonzero": bool((gl != 0).any()),
            }
            print(tag, rows[tag], flush=True)
        rows["speedup_walk_vs_brute"] = (rows["brute_control"]["wall_ms"]
                                         / rows["walk"]["wall_ms"])
        res["tpu"] = rows
        res["config"] = {k: str(v) for k, v in common.items()}

    mode = "cpu_mesh" if CPU_MESH else "tpu"
    prev = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
    prev.update({k: v for k, v in res.items() if k != mode})
    prev[mode] = res.get(mode, res.get("cpu_mesh"))
    with open(OUT, "w") as f:
        json.dump(prev, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
