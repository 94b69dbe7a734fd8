"""Metric aggregation + scalar/audio logging.

Replaces the reference's keras ``metrics.Mean`` trackers (vqvae.py:78-104,
prior.py:165-178) and TensorBoard writers (monitors.py:50-86) with a
framework-free running-mean aggregator, JSONL scalar logs and stdlib WAV
dumps.  If TensorBoard is wanted, point any TB reader at the JSONL.
"""

from __future__ import annotations

import json
import os
import time
import wave
from collections import defaultdict
from typing import Dict, Optional

import numpy as np

SAMPLE_RATE = 3000


class MeanAggregator:
    """Running means over steps, reset per logging interval (keras Mean)."""

    def __init__(self):
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    def update(self, metrics: Dict) -> None:
        for k, v in metrics.items():
            if isinstance(v, dict):
                continue
            self._sums[k] += float(v)
            self._counts[k] += 1

    def result(self) -> Dict[str, float]:
        return {k: self._sums[k] / max(self._counts[k], 1) for k in self._sums}

    def reset(self) -> None:
        self._sums.clear()
        self._counts.clear()


class ScalarLogger:
    """Append-only JSONL scalar log + console echo."""

    def __init__(self, log_dir: Optional[str], name: str = "train",
                 echo: bool = True):
        self.echo = echo
        self.path = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.path = os.path.join(log_dir, f"{name}.jsonl")

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        record = {"step": int(step), "time": time.time(),
                  **{f"{prefix}{k}": float(v) for k, v in metrics.items()}}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self.echo:
            shown = {k: round(v, 4) for k, v in record.items()
                     if k not in ("time",)}
            print(f"[{prefix or 'train'}] {shown}")


def write_wav(path: str, waveform: np.ndarray, sample_rate: int = SAMPLE_RATE) -> None:
    """(T,) or (T, 1) float waveform in [-1, 1] -> 16-bit PCM WAV."""
    wav = np.asarray(waveform).reshape(-1)
    wav = np.clip(wav, -1.0, 1.0)
    pcm = (wav * 32767.0).astype(np.int16)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


class HistogramLogger:
    """Per-leaf histograms of parameter / gradient pytrees.

    Equivalent of the reference's optional-but-expensive TensorBoard
    histograms of every variable and gradient (prior.py:306-316), without
    the TF dependency: each ``log`` call writes one compressed ``.npz``
    snapshot (``<leaf>__counts`` / ``<leaf>__edges`` arrays per leaf) plus a
    JSONL line of summary moments (mean/std/min/max/rms) per leaf.
    """

    def __init__(self, log_dir: str, name: str = "histograms", bins: int = 64):
        self.dir = os.path.join(log_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        self.bins = bins
        self.index_path = os.path.join(self.dir, "index.jsonl")

    @staticmethod
    def _leaves(tree, prefix: str):
        import jax

        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in flat:
            name = prefix + "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            yield name, np.asarray(leaf)

    def log(self, step: int, tree, prefix: str = "") -> str:
        """Write histograms of every array leaf in ``tree``; returns npz path.

        ``prefix`` namespaces the leaves (e.g. 'param/', 'grad/') and keeps
        snapshots of different trees at the same step in distinct files.
        """
        arrays, summary = {}, {"step": int(step), "time": time.time()}
        for name, leaf in self._leaves(tree, prefix):
            flat = leaf.reshape(-1).astype(np.float64)
            counts, edges = np.histogram(flat, bins=self.bins)
            arrays[f"{name}__counts"] = counts
            arrays[f"{name}__edges"] = edges
            summary[name] = {
                "mean": float(flat.mean()), "std": float(flat.std()),
                "min": float(flat.min()), "max": float(flat.max()),
                "rms": float(np.sqrt(np.mean(flat ** 2))),
            }
        tag = "_" + prefix.strip("/") if prefix else ""
        path = os.path.join(self.dir, f"step{int(step):08d}{tag}.npz")
        np.savez_compressed(path, **arrays)
        with open(self.index_path, "a") as f:
            f.write(json.dumps(summary) + "\n")
        return path


def codebook_usage_report(n_t: np.ndarray, threshold: float = 1.0) -> Dict[str, float]:
    """Codebook-health snapshot (tf_utils.py:82-90, VectorQuantizer.py:149-159)."""
    n_t = np.asarray(n_t)
    p = n_t / max(n_t.sum(), 1e-8)
    return {
        "codes_in_use": float((n_t >= threshold).sum()),
        "codes_total": float(n_t.size),
        "usage_fraction": float((n_t >= threshold).mean()),
        "running_entropy": float(-(p * np.log(p + 1e-8)).sum()),
    }
