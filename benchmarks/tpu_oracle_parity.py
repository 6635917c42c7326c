#!/usr/bin/env python
"""On-TPU oracle parity artifact (VERDICT r2 missing #3 / next-step #7).

Traces the canyon + box scenes with the bench kernel configuration
(``backend="pallas", precision="exact1", fuse4``) ON THE REAL CHIP and
compares against the compiled C reference running on the host CPU
(tests/oracle), masked per SURVEY.md §3.5 (denormal slots, never-written
fields, Doppler aliasing).  Emits one JSON blob with mask agreement,
allclose fractions and hit-decision flip taxonomy counts to
``benchmarks/logs/tpu_oracle_parity_r3.json``.

The CPU parity suite (tests/test_parity.py) pins the jnp path; this script
pins what ``bench.py`` actually measures, as compiled for the TPU.
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402

import hermespy_rt_tpu as hrt  # noqa: E402
from hermespy_rt_tpu.utils.profiling import device_to_numpy  # noqa: E402
from hermespy_rt_tpu.scene import load_hrt, flatten_scene  # noqa: E402
from tests.oracle.oracle import run_reference  # noqa: E402
from tests.utils import edge_distance_f64  # noqa: E402

SCENES = "/root/reference/scenes"
TINY = 1e-37   # XLA FTZ vs reference denormals (tests/test_parity.py)


def frac_close(ref, us, rtol, atol, mask=None):
    ref, us = np.asarray(ref), np.asarray(us)
    finite = (np.isfinite(ref) if np.issubdtype(ref.dtype, np.floating)
              else np.isfinite(ref.real) & np.isfinite(ref.imag))
    ok = (np.abs(ref - us) <= atol + rtol * np.abs(ref)) | ~finite
    if mask is not None:
        ok = ok | ~mask
    return float(ok.mean())


def run_one(scene, rx, tx, f, P, B):
    path = os.path.join(SCENES, scene)
    rx = np.asarray(rx, np.float32).reshape(-1, 3)
    tx = np.asarray(tx, np.float32).reshape(-1, 3)
    z = np.zeros_like(rx)
    ref = run_reference(path, rx, tx, z, np.zeros_like(tx), f, P, B)
    los, scat = hrt.compute_paths(
        path, rx, tx, z, np.zeros_like(tx), f, rx.shape[0], tx.shape[0],
        P, B, backend="pallas", precision="exact1", fuse4=True,
        keep_rays=False)
    a_te = device_to_numpy(scat.a_te)
    a_tm = device_to_numpy(scat.a_tm)
    tau = device_to_numpy(scat.tau)
    drx = device_to_numpy(scat.directions_rx)
    l_te = device_to_numpy(los.a_te)
    l_tau = device_to_numpy(los.tau)

    nz_ref = np.abs(ref.scatter.a_te) > TINY
    nz_us = np.abs(a_te) > TINY
    mask_agree = float((nz_ref == nz_us).mean())
    m = nz_ref & nz_us
    scale = float(np.abs(ref.scatter.a_te[m]).max()) if m.any() else 1.0
    row = {
        "scene": scene, "P": P, "B": B, "f_ghz": f,
        "scatter_slots": int(a_te.size),
        "scatter_mask_agreement": mask_agree,
        "a_te_close": frac_close(ref.scatter.a_te[m], a_te[m], 5e-5,
                                 5e-5 * scale),
        "a_tm_close": frac_close(ref.scatter.a_tm[m], a_tm[m], 5e-5,
                                 5e-5 * scale),
        "tau_close": frac_close(ref.scatter.tau[m], tau[m], 1e-5, 1e-12),
        "dir_rx_close": frac_close(ref.scatter.directions_rx[m], drx[m],
                                   1e-4, 1e-5),
        "los_a_te_close": frac_close(ref.los.a_te, l_te, 1e-6, 1e-9),
        "los_tau_close": frac_close(ref.los.tau, l_tau, 1e-6, 1e-18),
    }

    # hit-decision flip taxonomy on the launch set: TPU exact1 kernel vs the
    # oracle-identical jnp golden (CPU), classified per tests/utils rules
    import jax.numpy as jnp
    from hermespy_rt_tpu.ops.geometry import fibonacci_sphere
    from hermespy_rt_tpu.ops.intersect import intersect_jnp
    from hermespy_rt_tpu.ops.intersect_pallas import pallas_intersect
    tris = flatten_scene(load_hrt(path))
    dirs = np.asarray(fibonacci_sphere(P), np.float32)
    o = np.broadcast_to(tx[0], dirs.shape).copy()
    t_k, i_k = jax.jit(lambda o_, d_: pallas_intersect(
        o_, d_, tris, precision="exact1", fuse4=True))(
            jnp.asarray(o), jnp.asarray(dirs))
    t_k, i_k = np.asarray(t_k), np.asarray(i_k)
    t_j, i_j = map(np.asarray, intersect_jnp(jnp.asarray(o),
                                             jnp.asarray(dirs), tris))
    flips = np.where(i_k != i_j)[0]
    tie = edge = 0
    for r in flips:
        both = i_k[r] >= 0 and i_j[r] >= 0
        if both and abs(t_k[r] - t_j[r]) <= 1e-5 * max(abs(t_j[r]), 1e-12):
            tie += 1
            continue
        is_edge = False
        for ii in (i_k[r], i_j[r]):
            if ii >= 0:
                ed = edge_distance_f64(tris, o[r:r + 1], dirs[r:r + 1],
                                       np.asarray([ii]))
                if abs(float(ed[0])) <= 1e-4:
                    is_edge = True
        if is_edge:
            edge += 1
    row["launch_flips"] = {"total": int(len(flips)), "tie": int(tie),
                           "edge": int(edge),
                           "unexplained": int(len(flips) - tie - edge)}
    return row


def main():
    rows = [
        run_one("simple_street_canyon_with_cars.hrt",
                [[10.0, 5.0, 2.0]], [[-20.0, -10.0, 10.0]], 3.0, 20000, 3),
        run_one("box.hrt", [[1.0, 2.0, 1.5]], [[-2.0, -1.0, 2.5]],
                3.0, 20000, 2),
    ]
    out = {"round": 3, "kernel": "pallas exact1 fuse4 (bench config)",
           "device": str(jax.devices()[0]), "rows": rows}
    path = "/root/repo/benchmarks/logs/tpu_oracle_parity_r3.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
