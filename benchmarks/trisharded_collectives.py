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


_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8}


def count(cfg, mesh, tris, mats, rx, tx, z):
    def loss_fn(m):
        r = trace_paths_sharded(tris, m, rx, tx, z, z, jnp.float32(3.0),
                                cfg, mesh=mesh)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9

    lowered = jax.jit(jax.value_and_grad(loss_fn)).lower(mats)
    hlo = lowered.compile().as_text()
    kinds = {}
    mbytes = 0.0
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        # count op starts only (fusion-internal references excluded)
        starts = re.findall(rf"^\s*%?\S+ = (\S+) {op}\(", hlo, re.M)
        if starts:
            kinds[op] = len(starts)
        # bytes moved per op = its result shape (per participating device)
        for shape in starts:
            for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape):
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                mbytes += n * _DTYPE_BYTES.get(dt, 4) / 1e6
    return kinds, sum(kinds.values()), round(mbytes, 2)


def main():
    tris = flatten_scene(
        load_hrt("/root/reference/scenes/simple_street_canyon_with_cars.hrt"))
    mats = default_materials()
    rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
    tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
    z = jnp.zeros((1, 3), jnp.float32)
    B = 3
    mesh = default_mesh(num_ray_shards=2, num_tri_shards=4)
    rows = {}
    for tag, tst in (("replicated_table+butterfly_argmin (r5 default)",
                      "auto"),
                     ("sharded_table+butterfly_argmin", True)):
        cfg = TracerConfig(num_paths=1 << 12, num_bounces=B, backend="jnp",
                           keep_rays=False, unroll_bounces=True,
                           tri_shard_table=tst)
        kinds, total, mbytes = count(cfg, mesh, tris, mats, rx, tx, z)
        rows[tag] = dict(collectives=kinds, total=total,
                         per_bounce=round(total / B, 1),
                         mbytes_per_step=mbytes)
    rec = dict(mesh="rays=2 x tris=4", bounces=B, rows=rows,
               note=("r4 control (sharded table + double-pmin argmin): "
                     "31 total, 10.3/bounce — see the r4 copy of this "
                     "file.  The butterfly argmin trades 2 chained "
                     "all-reduces per query for log2(n) explicit "
                     "collective-permutes: MORE HLO ops, FEWER serial "
                     "exchange rounds on a real ICI ring."))
    print(json.dumps(rec, indent=2))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "logs",
                       "trisharded_collectives_r5.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
