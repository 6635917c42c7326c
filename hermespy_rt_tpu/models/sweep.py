"""Batched sweep driver with per-chunk checkpoint/resume.

The reference has no checkpointing (SURVEY.md §5: the only persistence is the
HRT scene file).  Long production runs — e.g. coverage maps over thousands of
RX probe positions — need restartable execution: this driver chunks the RX
set, traces each chunk with the (jitted, cached) tracer, writes one ``.npz``
per chunk, and on restart skips chunks whose files already exist and verify.
Tracing is stateless, so "recovery" after any failure is simply rerunning the
missing chunks (the SURVEY.md §5 failure-detection plan).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from ..config import TracerConfig
from ..materials import MaterialTable, default_materials

__all__ = ["SweepConfig", "run_sweep", "load_sweep_results"]


@dataclass(frozen=True)
class SweepConfig:
    """A chunked sweep over RX positions for a fixed TX set."""

    output_dir: str
    chunk_size: int = 64
    carrier_frequency_ghz: float = 3.0
    tracer: TracerConfig = TracerConfig(num_paths=4096, num_bounces=3,
                                        keep_rays=False)


def _chunk_path(out_dir: str, idx: int) -> str:
    return os.path.join(out_dir, f"chunk_{idx:05d}.npz")


def _chunk_valid(path: str, expect_rx: int) -> bool:
    if not os.path.exists(path):
        return False
    try:
        with np.load(path) as z:
            return z["a_te"].shape[0] == expect_rx
    except Exception:
        return False


def run_sweep(scene, tx_positions, rx_positions, cfg: SweepConfig,
              materials: Optional[MaterialTable] = None,
              tx_velocities=None, rx_velocities=None,
              progress: bool = False) -> int:
    """Trace ``rx_positions`` against ``tx_positions`` in resumable chunks.

    Returns the number of chunks actually computed this call (0 when the
    sweep was already complete).  Results: per-chunk ``.npz`` files with the
    scatter/LoS channel arrays, plus a ``manifest.json``.
    """
    from ..api import prepare_scene, trace

    os.makedirs(cfg.output_dir, exist_ok=True)
    rx_positions = np.asarray(rx_positions, np.float32).reshape(-1, 3)
    tx_positions = np.asarray(tx_positions, np.float32).reshape(-1, 3)
    rx_velocities = (np.zeros_like(rx_positions) if rx_velocities is None
                     else np.asarray(rx_velocities, np.float32))
    n = rx_positions.shape[0]
    n_chunks = -(-n // cfg.chunk_size)

    manifest = {
        "num_rx": int(n), "num_tx": int(tx_positions.shape[0]),
        "chunk_size": cfg.chunk_size, "num_chunks": n_chunks,
        "carrier_frequency_ghz": cfg.carrier_frequency_ghz,
        "num_paths": cfg.tracer.num_paths,
        "num_bounces": cfg.tracer.num_bounces,
    }
    with open(os.path.join(cfg.output_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)

    tris = prepare_scene(scene)
    mats = materials if materials is not None else default_materials()
    computed = 0
    for ci in range(n_chunks):
        path = _chunk_path(cfg.output_dir, ci)
        lo = ci * cfg.chunk_size
        hi = min(lo + cfg.chunk_size, n)
        if _chunk_valid(path, hi - lo):
            continue
        rx_c = rx_positions[lo:hi]
        rxv_c = rx_velocities[lo:hi]
        # pad the last chunk so every chunk hits the same jit cache entry
        pad = cfg.chunk_size - (hi - lo)
        if pad:
            rx_c = np.concatenate([rx_c, np.zeros((pad, 3), np.float32)])
            rxv_c = np.concatenate([rxv_c, np.zeros((pad, 3), np.float32)])
        res = trace(tris, rx_c, tx_positions, rxv_c, tx_velocities,
                    cfg.carrier_frequency_ghz, config=cfg.tracer,
                    materials=mats)
        k = hi - lo
        tmp = path + ".tmp.npz"
        np.savez(tmp,
                 rx_positions=rx_positions[lo:hi],
                 a_te=np.asarray(res.scatter.a_te)[:k],
                 a_tm=np.asarray(res.scatter.a_tm)[:k],
                 tau=np.asarray(res.scatter.tau)[:k],
                 freq_shift=np.asarray(res.scatter.freq_shift)[:k],
                 los_a_te=np.asarray(res.los.a_te)[:k],
                 los_tau=np.asarray(res.los.tau)[:k])
        os.replace(tmp, path)  # atomic: a crash never leaves a bad chunk
        computed += 1
        if progress:
            print(f"chunk {ci + 1}/{n_chunks} done", flush=True)
    return computed


def load_sweep_results(output_dir: str) -> Iterator[dict]:
    """Yield per-chunk result dicts in order."""
    with open(os.path.join(output_dir, "manifest.json")) as f:
        manifest = json.load(f)
    for ci in range(manifest["num_chunks"]):
        with np.load(_chunk_path(output_dir, ci)) as z:
            yield {k: z[k] for k in z.files}
