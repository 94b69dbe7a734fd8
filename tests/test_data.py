"""Data-pipeline tests: GTZAN reader semantics, native C++ loader parity."""

import os
import wave

import numpy as np
import pytest

from vae_music_tpu.data import native
from vae_music_tpu.data.gtzan import (
    GENRES,
    _stratified_split,
    load_audio,
    read_data,
    splitsongs,
)


def _write_wav(path, sig, sr=22050, channels=1, width=2):
    sig = np.asarray(sig, np.float32)
    if channels > 1:
        sig = np.stack([sig] * channels, axis=-1)
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(width)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def test_splitsongs_no_split():
    x = np.arange(100, dtype=np.float32)
    xs, ys = splitsongs(x, 3, window=1.0, overlap=0.0)
    assert xs.shape == (1, 100)
    assert list(ys) == [3]


def test_splitsongs_overlap_and_boundaries():
    x = np.arange(100, dtype=np.float32)
    xs, ys = splitsongs(x, 1, window=0.5, overlap=0.5)
    # chunk 50, offset 25 -> starts 0, 25, 50 (75 would be a short remainder)
    assert xs.shape == (3, 50)
    np.testing.assert_array_equal(xs[1], np.arange(25, 75))


def test_stratified_split_deterministic():
    items = np.arange(100)
    strat = np.array([i % 4 for i in range(100)])
    tr1, te1 = _stratified_split(items, strat, 0.2)
    tr2, te2 = _stratified_split(items, strat, 0.2)
    np.testing.assert_array_equal(tr1, tr2)
    assert len(te1) == 20
    # stratified: 5 test items per class
    assert all((strat[te1] == c).sum() == 5 for c in range(4))


def test_load_audio_resamples(tmp_path):
    sr = 22050
    t = np.linspace(0, 1, sr, endpoint=False)
    _write_wav(tmp_path / "a.wav", 0.5 * np.sin(2 * np.pi * 220 * t), sr=sr)
    x = load_audio(str(tmp_path / "a.wav"), sr=3000)
    assert x.shape == (1, 3000)
    assert np.abs(x).max() <= 0.55


def test_read_data_walks_genres_and_skips_corrupt(tmp_path):
    sr = 3000
    t = np.linspace(0, 2, 2 * sr, endpoint=False)
    for genre in ("jazz", "rock"):
        os.makedirs(tmp_path / genre)
        for i in range(4):
            _write_wav(tmp_path / genre / f"{genre}.0000{i}.wav",
                       0.3 * np.sin(2 * np.pi * (100 + 50 * i) * t), sr=sr)
    # the corrupt file the reference skips (data_utils.py:161)
    _write_wav(tmp_path / "jazz" / "jazz.00054.wav", np.zeros(100), sr=sr)

    genres = {"jazz": 4, "rock": 3}
    xtr, ytr, ftr, xte, yte, fte = read_data(
        str(tmp_path), genres, test_data_percentage=0.25, sample_rate=sr,
        duration=2, max_signal_len=6000, split_window=0.5, split_overlap=0.0)
    assert len(xtr) + len(xte) == 8 * 2  # 8 usable files x 2 segments each
    assert xtr.shape[-1] == 3000
    assert set(np.unique(ytr)) <= {3, 4}
    assert not any("00054" in f for f in list(ftr) + list(fte))


@pytest.mark.skipif(not native.available(), reason="native loader not built")
def test_native_wav_decode_matches_python(tmp_path):
    sr = 8000
    t = np.linspace(0, 1, sr, endpoint=False)
    sig = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    _write_wav(tmp_path / "m.wav", sig, sr=sr, channels=2)
    x, got_sr = native.load_wav(str(tmp_path / "m.wav"))
    assert got_sr == sr
    assert x.shape == (sr,)
    np.testing.assert_allclose(x, sig, atol=1e-4)


@pytest.mark.skipif(not native.available(), reason="native loader not built")
def test_native_batch_loader(tmp_path):
    sr = 6000
    t = np.linspace(0, 1, sr, endpoint=False)
    paths = []
    for i in range(3):
        p = tmp_path / f"b{i}.wav"
        _write_wav(p, 0.2 * np.sin(2 * np.pi * (100 * (i + 1)) * t), sr=sr)
        paths.append(str(p))
    paths.append(str(tmp_path / "missing.wav"))
    waves, lengths = native.load_batch(paths, target_sr=3000, max_len=3000)
    assert waves.shape == (4, 3000)
    assert list(lengths[:3]) == [3000, 3000, 3000]
    assert lengths[3] == -1
    assert np.all(waves[3] == 0)


@pytest.mark.skipif(not native.available(), reason="native loader not built")
def test_native_split_windows_matches_python():
    x = np.arange(100, dtype=np.float32)
    got = native.split_windows(x, window=0.5, overlap=0.5)
    want, _ = splitsongs(x, 0, window=0.5, overlap=0.5)
    np.testing.assert_array_equal(got, want)


def test_vq_pallas_interpret_matches_reference():
    """Fused VQ kernel == jnp reference, including EMA partials (CPU interpret)."""
    import jax
    import jax.numpy as jnp

    from vae_music_tpu.nn.quantizer import codebook_lookup, nearest_code
    from vae_music_tpu.ops.vq_pallas import fused_vq_assign

    rng = np.random.default_rng(0)
    n, d, k = 300, 8, 128  # n % tile != 0 -> exercises the padding path
    flat = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32))
    codes, quant, m_b, n_b = fused_vq_assign(flat, emb, tile=256, interpret=True)
    ref_codes = nearest_code(flat, emb)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref_codes))
    np.testing.assert_allclose(np.asarray(quant),
                               np.asarray(codebook_lookup(ref_codes, emb)),
                               rtol=1e-5, atol=1e-6)
    onehot = np.eye(k, dtype=np.float32)[np.asarray(ref_codes)]
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(flat).T @ onehot,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(n_b), onehot.sum(0), atol=1e-5)


@pytest.mark.skipif(not native.available(), reason="native loader not built")
def test_native_prefetcher(tmp_path):
    sr = 6000
    t = np.linspace(0, 1, sr, endpoint=False)
    paths = []
    for i in range(5):
        p = tmp_path / f"p{i}.wav"
        _write_wav(p, (0.1 * (i + 1)) * np.sin(2 * np.pi * 200 * t), sr=sr)
        paths.append(str(p))
    pf = native.BatchPrefetcher(paths, target_sr=3000, max_len=3000,
                                batch=2, n_threads=2, seed=7)
    seen_amplitudes = set()
    for _ in range(6):  # > one epoch: prefetcher must reshuffle and continue
        b = pf.next_batch()
        assert b.shape == (2, 3000, 1)
        assert np.isfinite(b).all()
        for row in b[..., 0]:
            seen_amplitudes.add(round(float(np.abs(row).max()), 1))
    pf.close()
    assert len(seen_amplitudes) >= 3  # multiple distinct files served
