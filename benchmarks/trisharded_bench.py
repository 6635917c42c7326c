#!/usr/bin/env python
"""Tri-sharded scene access cost on the virtual CPU mesh (VERDICT r3 #7).

Same total device count (8), three layouts of the B=3 fwd+bwd canyon step:
  rays=8 x tris=1   (scene replicated — the control: zero fetch collectives)
  rays=4 x tris=2
  rays=2 x tris=4
Median-of-5 walls; the ratio to the replicated layout isolates what
triangle sharding costs (pmin pair per query + ONE masked-psum payload
fetch per bounce + normal_at psum, after the r4 single-psum refactor).
Writes benchmarks/logs/trisharded_bench_r5.json.

r5: the tri-sharded rows run BOTH payload-table placements
(tri_shard_table False = replicated-table local fetch, True = r4-style
masked-psum fetch) under the butterfly argmin.
"""
import json
import os
import statistics
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.parallel import default_mesh, trace_paths_sharded
from hermespy_rt_tpu.scene import load_hrt, flatten_scene


def main():
    tris = flatten_scene(
        load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt"))
    mats = default_materials()
    rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
    tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
    z = jnp.zeros((1, 3), jnp.float32)
    P, B = 1 << 16, 3
    rows = []
    base = None
    for n_rays, n_tris, tst in ((8, 1, "auto"), (4, 2, False), (4, 2, True),
                                (2, 4, False), (2, 4, True)):
        mesh = default_mesh(num_ray_shards=n_rays, num_tri_shards=n_tris)
        cfg = TracerConfig(num_paths=P, num_bounces=B, backend="jnp",
                           keep_rays=False, unroll_bounces=True,
                           tri_shard_table=tst)

        def loss_fn(m):
            r = trace_paths_sharded(tris, m, rx, tx, z, z, jnp.float32(3.0),
                                    cfg, mesh=mesh)
            return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                    + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9

        step = jax.jit(jax.value_and_grad(loss_fn))
        out = step(mats)
        jax.block_until_ready(out)
        walls = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = step(mats)
            jax.block_until_ready(out)
            walls.append((time.perf_counter() - t0) * 1e3)
        med = statistics.median(walls)
        if base is None:
            base = med
        rows.append(dict(mesh=f"rays={n_rays} x tris={n_tris}",
                         table=("replicated" if n_tris > 1 and tst is False
                                else ("sharded" if n_tris > 1 else "n/a")),
                         median_ms=round(med, 1),
                         walls_ms=[round(w, 1) for w in walls],
                         vs_replicated=round(med / base, 3),
                         loss=float(out[0])))
        print(rows[-1], flush=True)

    rec = dict(paths=P, bounces=B, reps=5, host_cores=2, virtual=True,
               note=("vs_replicated isolates triangle-sharding cost at "
                     "constant device count; r5: butterfly argmin; table column says payload placement"),
               rows=rows)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "logs", "trisharded_bench_r5.json")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print("written", out_path, flush=True)


if __name__ == "__main__":
    main()
