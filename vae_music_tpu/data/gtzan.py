"""GTZAN data pipeline.

Reproduces the semantics of /root/reference/data_utils.py:
  * ``read_data`` (:146-206): walk ``src_dir/<genre>`` folders, cap files per
    genre, skip the corrupt ``jazz/jazz.00054.wav``, stratified train/test split
    (either at file level, or split-songs-first then stratify by file label)
  * ``splitsongs`` (:65-91): overlapping-window segmentation
  * ``split_convert`` (:100-136): load -> truncate -> segment

Audio IO prefers the native C++ WAV loader (vae_music_tpu.data.native) and
falls back to a pure-numpy WAV reader; librosa is used only if present for
non-WAV formats.  Output arrays are channel-last (N, T, 1) float32, ready for
host->device transfer with per-host sharding.
"""

from __future__ import annotations

import os
import wave
from typing import Dict, List, Optional, Tuple

import numpy as np

SAMPLE_RATE = 3000  # data_utils.py:11

GENRES: Dict[str, int] = {
    "metal": 0, "disco": 1, "classical": 2, "rock": 3, "jazz": 4,
    "country": 5, "pop": 6, "blues": 7, "reggae": 8, "hiphop": 9,
}
IDX_TO_GENRES = {v: k for k, v in GENRES.items()}

_CORRUPT = "jazz/jazz.00054.wav"  # data_utils.py:161


def _resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    if sr_in == sr_out:
        return x
    n_out = int(round(x.shape[-1] * sr_out / sr_in))
    t_out = np.linspace(0.0, x.shape[-1] - 1, n_out)
    return np.interp(t_out, np.arange(x.shape[-1]), x).astype(np.float32)


def load_audio(path: str, sr: int = SAMPLE_RATE, duration: Optional[float] = None) -> np.ndarray:
    """Load mono audio at ``sr``; returns (1, T) float32 (data_utils.py:43-48)."""
    from vae_music_tpu.data import native

    x = None
    sr_in = None
    if path.lower().endswith((".wav", ".au")):
        try:
            x, sr_in = native.load_wav(path)
        except Exception:
            x = None
    if x is None:
        try:  # non-wav formats, or native loader unavailable
            import librosa

            y, _ = librosa.load(path, sr=sr, mono=True, duration=duration)
            return y.reshape(1, -1).astype(np.float32)
        except Exception:
            with wave.open(path, "rb") as f:
                sr_in = f.getframerate()
                n = f.getnframes()
                raw = np.frombuffer(f.readframes(n), dtype=np.int16)
                if f.getnchannels() > 1:
                    raw = raw.reshape(-1, f.getnchannels()).mean(axis=1)
                x = raw.astype(np.float32) / 32768.0
    if duration is not None:
        x = x[: int(duration * sr_in)]
    x = _resample_linear(x, sr_in, sr)
    return x.reshape(1, -1).astype(np.float32)


def splitsongs(x: np.ndarray, y, window: float = 0.05, overlap: float = 0.5):
    """Overlapping-window song segmentation (data_utils.py:65-91).

    window==1.0, overlap==0.0 -> no split.
    """
    xshape = x.shape[-1]
    chunk = int(xshape * window)
    offset = int(chunk * (1.0 - overlap))
    xs, ys = [], []
    for i in range(0, xshape - chunk + offset, max(offset, 1)):
        s = x[..., i : i + chunk]
        if s.shape[-1] != chunk:
            continue  # drop boundary remainders
        xs.append(s)
        ys.append(y)
    return np.array(xs), np.array(ys)


def split_convert(
    files: List[str],
    labels: List[int],
    sample_rate: int = SAMPLE_RATE,
    duration: float = 30,
    max_signal_len: int = 660000,
    split_window: float = 1.0,
    split_overlap: float = 0.0,
):
    """Load each file, truncate, segment (data_utils.py:100-136)."""
    waves, genres, file_labels = [], [], []
    for fn, genre in zip(files, labels):
        file_label = os.path.basename(fn)
        signal = load_audio(fn, sr=sample_rate, duration=duration)
        signal = signal[:, :max_signal_len]
        segs, ys = splitsongs(signal, genre, window=split_window, overlap=split_overlap)
        waves.extend(segs)
        genres.extend(ys)
        file_labels.extend([file_label] * len(ys))
    return np.array(waves), np.array(genres), np.array(file_labels)


def _stratified_split(items, strat, test_fraction: float, seed: int = 42):
    """Deterministic stratified split (replacement for sklearn train_test_split)."""
    rng = np.random.default_rng(seed)
    strat = np.asarray(strat)
    train_idx, test_idx = [], []
    for key in np.unique(strat):
        idx = np.where(strat == key)[0]
        rng.shuffle(idx)
        n_test = max(1, int(round(len(idx) * test_fraction))) if len(idx) > 1 else 0
        test_idx.extend(idx[:n_test])
        train_idx.extend(idx[n_test:])
    train_idx, test_idx = np.array(train_idx), np.array(test_idx)
    rng.shuffle(train_idx)
    rng.shuffle(test_idx)
    return train_idx, test_idx


def read_data(
    src_dir: str,
    genres: Dict[str, int] = GENRES,
    test_data_percentage: float = 0.1,
    sample_rate: int = SAMPLE_RATE,
    duration: float = 30,
    split_window: float = 1.0,
    split_overlap: float = 0.0,
    max_signal_len: int = 660000,
    shuffle_after_split: bool = False,
    max_files_per_genre: int = 1000,
):
    """GTZAN reader (data_utils.py:146-206).

    Returns (X_train, y_train, file_train, X_test, y_test, file_test) with
    X_* of shape (N, 1, T).
    """
    arr_fn, arr_genres = [], []
    for name, label in genres.items():
        folder = os.path.join(src_dir, name)
        for root, _subdirs, files in os.walk(folder):
            for file in sorted(files)[:max_files_per_genre]:
                file_name = os.path.join(folder, file)
                if file_name.replace(os.sep, "/").endswith(_CORRUPT):
                    continue  # corrupt sample skipped upstream too
                arr_fn.append(file_name)
                arr_genres.append(label)

    if shuffle_after_split:
        # Segment first, then stratify by source-file label (data_utils.py:170-183).
        x, y, y_file = split_convert(
            arr_fn, arr_genres, sample_rate=sample_rate, duration=duration,
            max_signal_len=max_signal_len, split_window=split_window,
            split_overlap=split_overlap,
        )
        tr, te = _stratified_split(x, y_file, test_data_percentage)
        return x[tr], y[tr], y_file[tr], x[te], y[te], y_file[te]

    tr, te = _stratified_split(arr_fn, arr_genres, test_data_percentage)
    fn, gn = np.array(arr_fn), np.array(arr_genres)
    x_test, y_test, f_test = split_convert(
        fn[te].tolist(), gn[te].tolist(), sample_rate=sample_rate, duration=duration,
        max_signal_len=max_signal_len, split_window=split_window, split_overlap=split_overlap,
    )
    x_train, y_train, f_train = split_convert(
        fn[tr].tolist(), gn[tr].tolist(), sample_rate=sample_rate, duration=duration,
        max_signal_len=max_signal_len, split_window=split_window, split_overlap=split_overlap,
    )
    return x_train, y_train, f_train, x_test, y_test, f_test


def generate_genre_samples(x: np.ndarray, y: np.ndarray, return_genre: bool = False):
    """Pick one monitoring sample per genre (data_utils.py:209-238)."""
    samples, labels = [], []
    for g in sorted(np.unique(y)):
        idx = np.where(y == g)[0][0]
        samples.append(x[int(idx)])
        labels.append(int(g))
    samples = np.stack(samples, axis=0)
    if return_genre:
        return samples, np.array(labels)
    return samples
