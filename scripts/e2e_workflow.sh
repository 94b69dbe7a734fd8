#!/usr/bin/env bash
# Full training + generation workflow (the reference's lost trainer-notebook
# flow, reconstructed as CLIs).  Runs end-to-end on one TPU chip in ~15 min
# with synthetic data; point --data_dir at a GTZAN root for real training.
set -euo pipefail

OUT=${1:-runs/e2e}

python -m vae_music_tpu.cli.train_vqvae --config GTZAN_VQVAE \
  --epochs 6 --batch_size 32 --synthetic_examples 256 \
  --out_dir "$OUT/vqvae" --ckpt_interval 2 --val_interval 2 --inspect_interval 2

python -m vae_music_tpu.cli.train_prior --config GTZAN_VQVAE --level 1 \
  --vqvae_ckpt "$OUT/vqvae/ckpt" --epochs 4 --batch_size 16 \
  --synthetic_examples 128 --out_dir "$OUT/prior1"

python -m vae_music_tpu.cli.train_prior --config GTZAN_VQVAE --level 0 \
  --vqvae_ckpt "$OUT/vqvae/ckpt" --epochs 2 --batch_size 16 \
  --synthetic_examples 128 --out_dir "$OUT/prior0"

python -m vae_music_tpu.cli.generate --config FULL_PIPELINE --n_samples 4 \
  --genre 3 --vqvae_ckpt "$OUT/vqvae/ckpt" \
  --prior_ckpts "$OUT/prior0/ckpt" "$OUT/prior1/ckpt" \
  --out_dir "$OUT/samples"

echo "samples in $OUT/samples"
