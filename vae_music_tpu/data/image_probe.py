"""Spectrogram-image probe (analogue of /root/reference/data_loader.py:1-37).

Standalone utility (not imported by the training pipeline, like the
reference's) that loads GTZAN spectrogram PNGs into arrays and optionally
plots a grid.  PIL/matplotlib are optional.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


def load_spectrogram_images(
    src_dir: str,
    genres: Optional[List[str]] = None,
    max_per_genre: int = 10,
) -> Tuple[np.ndarray, List[str]]:
    """Walk ``src_dir/<genre>`` dirs for .png spectrograms -> (images, labels)."""
    try:
        from PIL import Image
    except ImportError as e:
        raise RuntimeError("PIL not available for image probing") from e

    images, labels = [], []
    genres = genres or sorted(os.listdir(src_dir))
    for genre in genres:
        folder = os.path.join(src_dir, genre)
        if not os.path.isdir(folder):
            continue
        count = 0
        for name in sorted(os.listdir(folder)):
            if not name.lower().endswith(".png") or count >= max_per_genre:
                continue
            img = np.asarray(Image.open(os.path.join(folder, name)).convert("RGB"))
            images.append(img)
            labels.append(genre)
            count += 1
    if not images:
        return np.zeros((0,)), []
    return np.stack(images), labels


def plot_image_grid(images: np.ndarray, labels: List[str], path: str) -> bool:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return False
    n = min(len(images), 9)
    fig = plt.figure(figsize=(12, 12))
    for i in range(n):
        ax = fig.add_subplot(3, 3, i + 1)
        ax.imshow(images[i])
        ax.set_title(labels[i])
        ax.axis("off")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    return True


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("src_dir")
    p.add_argument("--out", default="spectrograms.png")
    args = p.parse_args()
    imgs, labels = load_spectrogram_images(args.src_dir)
    print(f"loaded {len(labels)} spectrogram images")
    if len(labels):
        plot_image_grid(imgs, labels, args.out)
