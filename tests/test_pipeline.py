"""Input-pipeline and image-probe tests."""

import numpy as np
import pytest

from vae_music_tpu.data.pipeline import epoch_batches, prefetch_batches


def test_epoch_batches_shapes_and_shuffle():
    x = np.arange(20)[:, None].astype(np.float32)
    y = np.arange(20)
    rng = np.random.default_rng(0)
    batches = list(epoch_batches(x, y, 8, rng))
    assert len(batches) == 2  # drop remainder
    xb, yb = batches[0]
    assert xb.shape == (8, 1) and yb.shape == (8,)
    np.testing.assert_array_equal(xb[:, 0].astype(int), yb)  # pairing preserved


def test_prefetch_preserves_order_and_content():
    x = np.arange(32)[:, None].astype(np.float32)
    rng = np.random.default_rng(1)
    direct = [xb.copy() for xb, _ in epoch_batches(x, None, 4, rng)]
    rng = np.random.default_rng(1)
    fetched = [np.asarray(xb) for xb, _ in
               prefetch_batches(epoch_batches(x, None, 4, rng), depth=2)]
    assert len(direct) == len(fetched) == 8
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a, b)


def test_image_probe(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from vae_music_tpu.data.image_probe import load_spectrogram_images

    for genre in ("jazz", "rock"):
        d = tmp_path / genre
        d.mkdir()
        for i in range(2):
            Image.fromarray(
                (np.random.rand(8, 8, 3) * 255).astype(np.uint8)
            ).save(d / f"{genre}{i}.png")
    imgs, labels = load_spectrogram_images(str(tmp_path))
    assert imgs.shape == (4, 8, 8, 3)
    assert sorted(set(labels)) == ["jazz", "rock"]
