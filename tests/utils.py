"""Shared test helpers."""
from __future__ import annotations

import os

import numpy as np
import pytest

REF_SCENES = os.path.join(
    os.environ.get("HERMESPY_RT_REFERENCE", "/root/reference"), "scenes")


def ref_scene_path(name: str) -> str:
    path = os.path.join(REF_SCENES, name)
    if not os.path.exists(path):
        pytest.skip(f"reference scene {name} not available")
    return path


def assert_mostly_allclose(ref, us, rtol=1e-4, atol=0.0, max_bad_frac=0.0,
                           label=""):
    """Allclose that tolerates a tiny fraction of boundary-divergent slots.

    Float32 intersection decisions at triangle edges can legitimately differ
    between the C scan and the vectorised reduction by 1 ulp, flipping the
    entire output of that ray; ``max_bad_frac`` bounds how many slots may
    disagree while everything else must match to ``rtol/atol``.
    NaNs in ``ref`` (the reference's uninitialised/acos>1 slots) are excluded.
    """
    ref = np.asarray(ref)
    us = np.asarray(us)
    assert ref.shape == us.shape, f"{label}: shape {ref.shape} vs {us.shape}"
    finite = np.isfinite(ref) if np.issubdtype(ref.dtype, np.floating) else (
        np.isfinite(ref.real) & np.isfinite(ref.imag))
    err = np.abs(ref - us)
    tol = atol + rtol * np.abs(ref)
    ok = (err <= tol) | ~finite
    bad_frac = 1.0 - ok.mean()
    assert bad_frac <= max_bad_frac + 1e-12, (
        f"{label}: {bad_frac:.2%} of slots disagree (> {max_bad_frac:.2%}); "
        f"worst err {err[finite].max() if finite.any() else 0}")
