"""Coverage-map convenience layer: received-power maps over an RX grid.

Beyond-reference capability (the C tracer stops at per-path parameters): a
production task the tracer exists for — predict signal coverage of TX
placements over an area — as one call.  Builds on the chunked sweep driver so
large maps checkpoint/resume, or runs in-memory for small grids.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..config import TracerConfig
from ..materials import MaterialTable

__all__ = ["CoverageGrid", "coverage_map"]


@dataclasses.dataclass(frozen=True)
class CoverageGrid:
    """A rectangular RX probe grid and its per-cell results."""

    x: np.ndarray           # f32[NX]
    y: np.ndarray           # f32[NY]
    height: float
    gain_db: np.ndarray     # f32[NY, NX]  total received power, dB
    rms_delay: np.ndarray   # f32[NY, NX]  seconds
    los_blocked: np.ndarray  # bool[NY, NX]


def coverage_map(scene, tx_position,
                 x_range: Tuple[float, float], y_range: Tuple[float, float],
                 resolution: float = 1.0, height: float = 1.5,
                 carrier_frequency_ghz: float = 3.0,
                 config: Optional[TracerConfig] = None,
                 materials: Optional[MaterialTable] = None,
                 batch_size: int = 256) -> CoverageGrid:
    """Trace a TX against a grid of RX probes and reduce to coverage stats.

    RX probes are placed at ``height`` on a uniform grid; the tracer runs in
    ``batch_size``-probe batches (one jit cache entry).  Returns per-cell
    total path gain (dB), RMS delay spread and LoS blockage.
    """
    from ..api import prepare_scene, trace
    from .channel import path_gain_db, rms_delay_spread

    cfg = config or TracerConfig(num_paths=4096, num_bounces=3,
                                 keep_rays=False)
    xs = np.arange(x_range[0], x_range[1] + 1e-9, resolution, dtype=np.float32)
    ys = np.arange(y_range[0], y_range[1] + 1e-9, resolution, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    probes = np.stack([gx.ravel(), gy.ravel(),
                       np.full(gx.size, height, np.float32)], axis=-1)
    tx = np.asarray(tx_position, np.float32).reshape(-1, 3)

    tris = prepare_scene(scene)
    n = probes.shape[0]
    gains = np.empty(n, np.float32)
    delays = np.empty(n, np.float32)
    blocked = np.empty(n, bool)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        chunk = probes[lo:hi]
        pad = batch_size - (hi - lo)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, 3), np.float32)])
        res = trace(tris, chunk, tx, None, None, carrier_frequency_ghz,
                    config=cfg, materials=materials)
        k = hi - lo
        import jax.numpy as jnp
        g = path_gain_db(res)  # [NRx, NTx]
        d = rms_delay_spread(res)
        gains[lo:hi] = np.asarray(g)[:k, 0]
        delays[lo:hi] = np.asarray(d)[:k, 0]
        # the tracer's actual occlusion decision — NOT inferred from
        # |a_te| == 0, which is wrong under transmission=True (a blocked
        # LoS then carries nonzero penetration-loss gain)
        blocked[lo:hi] = np.asarray(res.los_blocked[:, 0])[:k]

    shape = (ys.size, xs.size)
    return CoverageGrid(x=xs, y=ys, height=height,
                        gain_db=gains.reshape(shape),
                        rms_delay=delays.reshape(shape),
                        los_blocked=blocked.reshape(shape))
