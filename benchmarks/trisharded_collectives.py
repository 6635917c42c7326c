#!/usr/bin/env python
"""Count collectives in the tri-sharded trace step (VERDICT r3 #7).

Compiles the fwd+bwd sharded step on a virtual (rays=2, tris=4) CPU mesh
and counts collective ops in the optimized HLO, total and per kind.  With
B bounces in reference parity the per-bounce collective budget is:

  bounce query:  2 pmin   (nearest-t, then tie-break index)
  payload fetch: 1 psum   (single fused [R,27] masked row — was 17/bounce
                           before the r4 single-psum refactor)
  shadow query:  2 pmin
  normal_at:     1 psum   (occluder normals for the theta-clobber)

plus one grad-psum per parameter leaf at the backward boundary (shard_map
transpose).  Writes benchmarks/logs/trisharded_collectives.json.
"""
import json
import os
import re
import sys

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


def count(cfg, mesh, tris, mats, rx, tx, z):
    def loss_fn(m):
        r = trace_paths_sharded(tris, m, rx, tx, z, z, jnp.float32(3.0),
                                cfg, mesh=mesh)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9

    lowered = jax.jit(jax.value_and_grad(loss_fn)).lower(mats)
    hlo = lowered.compile().as_text()
    kinds = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        n = len(re.findall(rf"\b{op}\b.*=|= {op}", hlo))
        # count op starts only (fusion-internal references excluded)
        n = len(re.findall(rf"^\s*%?\S+ = \S+ {op}\(", hlo, re.M))
        if n:
            kinds[op] = n
    return kinds, sum(kinds.values())


def main():
    tris = flatten_scene(
        load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt"))
    mats = default_materials()
    rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
    tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
    z = jnp.zeros((1, 3), jnp.float32)
    B = 3
    cfg = TracerConfig(num_paths=1 << 12, num_bounces=B, backend="jnp",
                       keep_rays=False, unroll_bounces=True)
    mesh = default_mesh(num_ray_shards=2, num_tri_shards=4)
    kinds, total = count(cfg, mesh, tris, mats, rx, tx, z)
    rec = dict(mesh="rays=2 x tris=4", bounces=B, collectives=kinds,
               total=total, per_bounce=round(total / B, 1))
    print(json.dumps(rec, indent=2))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs",
                       "trisharded_collectives.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
