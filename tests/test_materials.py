"""Material table + eta precompute tests, golden-checked against the C
reference's precomputed globals (/root/reference/src/compute_paths.c:171-206)."""
import ctypes

import numpy as np
import pytest

from hermespy_rt_tpu.materials import (MATERIAL_KEYS, NUM_MATERIALS,
                                       default_materials, get_material_index)
from hermespy_rt_tpu.ops.fresnel import precompute_eta


def test_table_shape_and_names():
    t = default_materials()
    assert t.num_materials == NUM_MATERIALS == 17
    assert get_material_index("concrete") == 1
    assert get_material_index("metal") == 13
    assert get_material_index("definitely_not_a_material") == 0  # air fallback
    assert len(MATERIAL_KEYS) == 17


def test_metal_is_near_perfect_conductor():
    t = default_materials()
    eta = precompute_eta(t, 3.0)
    # metal: c = 1e7 -> |eta| enormous -> |R| ~ 1 at all angles
    assert float(np.asarray(eta.eta_im)[13]) > 1e7


@pytest.mark.parametrize("f_ghz", [0.5, 3.0, 28.0, 70.0])
def test_eta_matches_c_reference(f_ghz):
    from tests.oracle import oracle as O
    lib = O._get_lib()
    scene = lib.scene_load(O.REFERENCE_DIR.encode() + b"/scenes/2cars.hrt")
    lib.precompute_materials.argtypes = [ctypes.POINTER(O.Scene), ctypes.c_float]
    lib.precompute_materials(ctypes.byref(scene), ctypes.c_float(f_ghz))
    arr = np.array((ctypes.c_float * (12 * 17)).in_dll(
        lib, "g_materials_precomputed")).reshape(17, 12)

    eta = precompute_eta(default_materials(), f_ghz)
    # 2cars.hrt uses materials 1 (concrete) and 13 (metal); only those rows
    # are populated by the C precompute.
    for m in (1, 13):
        c = arr[m]
        # struct layout: eta_re, eta_sqrt_re, eta_inv_re, eta_inv_sqrt_re,
        #                eta_im, eta_sqrt_im, eta_inv_im, eta_inv_sqrt_im,
        #                eta_abs, eta_abs_pow2, eta_abs_inv_sqrt, r
        got = [float(np.asarray(x)[m]) for x in
               (eta.eta_re, eta.eta_sqrt_re, eta.eta_inv_re, eta.eta_im,
                eta.eta_sqrt_im, eta.eta_inv_im, eta.eta_abs,
                eta.eta_abs_pow2, eta.eta_abs_inv_sqrt, eta.r)]
    want = [c[0], c[1], c[2], c[4], c[5], c[6], c[8], c[9], c[10], c[11]]
    np.testing.assert_allclose(got, want, rtol=2e-6)


def test_eta_differentiable():
    import jax
    import jax.numpy as jnp

    def loss(mats):
        eta = precompute_eta(mats, 3.0)
        return jnp.sum(eta.eta_re) + jnp.sum(eta.eta_im) + jnp.sum(eta.eta_sqrt_re)

    g = jax.grad(loss)(default_materials())
    assert np.all(np.isfinite(np.asarray(g.a)))
    assert np.all(np.isfinite(np.asarray(g.c)))
    assert float(np.asarray(g.a)[1]) > 0  # more permittivity -> more eta_re
