"""Train a prior or upsampler level on top of a frozen VQ-VAE.

  python -m vae_music_tpu.cli.train_prior --level 1 \
      --vqvae_ckpt runs/vqvae/ckpt --out_dir runs/prior1 --epochs 100
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="GTZAN_VQVAE")
    p.add_argument("--level", type=int, default=None,
                   help="prior level; top level if omitted")
    p.add_argument("--vqvae_ckpt", default=None,
                   help="VQ-VAE checkpoint dir (fresh random VQ-VAE if omitted)")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--out_dir", default="runs/prior")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--genre_classes", type=int, default=10)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--heads", type=int, default=2)
    p.add_argument("--blocks", type=int, default=4)
    p.add_argument("--attn_stacks", type=int, default=1)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--synthetic_examples", type=int, default=256)
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microsteps per optimizer update")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vae_music_tpu.configs import ConditionerConfig, PriorConfig, get_config
    from vae_music_tpu.data.audio import synthetic_audio_batch
    from vae_music_tpu.models.vqvae import init_vqvae
    from vae_music_tpu.train.checkpoint import CheckpointManager
    from vae_music_tpu.train.loop import train_prior
    from vae_music_tpu.train.monitors import PriorMonitor
    from vae_music_tpu.train.prior_step import (
        default_prior_optimizer,
        init_prior,
        make_prior_eval_step,
    )
    from vae_music_tpu.train.state import PriorTrainState, VQVAETrainState

    vcfg = get_config(args.config).validate()
    level = args.level if args.level is not None else vcfg.levels - 1
    pcfg = PriorConfig(
        level=level, levels=vcfg.levels, bins=vcfg.codebook_size + 1,
        width=args.width, depth=args.depth, heads=args.heads,
        blocks=args.blocks, attn_stacks=args.attn_stacks, dropout=args.dropout,
        genre_classes=args.genre_classes or None,
        conditioner=ConditionerConfig() if level != vcfg.levels - 1 else None,
    )

    vqvae_params, codebooks = init_vqvae(jax.random.PRNGKey(args.seed), vcfg)
    if args.vqvae_ckpt:
        vq_ckpt = CheckpointManager(args.vqvae_ckpt)
        template = VQVAETrainState.create(vqvae_params, codebooks, optax.adam(1e-4))
        restored = vq_ckpt.restore(template)
        vqvae_params, codebooks = restored.params, restored.codebooks
        print(f"loaded frozen VQ-VAE from step {int(restored.step)}")
    else:
        print("no --vqvae_ckpt: using a fresh random VQ-VAE (debug only)")

    if args.data_dir:
        from vae_music_tpu.data.gtzan import GENRES, read_data

        window = vcfg.sample_length / (30 * 3000)
        x_train, y_train, _f, x_test, y_test, _ft = read_data(
            args.data_dir, GENRES, split_window=window, split_overlap=0.5,
            max_signal_len=90000, shuffle_after_split=True)
        x_train = np.transpose(x_train, (0, 2, 1)).astype(np.float32)
        x_test = np.transpose(x_test, (0, 2, 1)).astype(np.float32)
    else:
        print("no --data_dir: using synthetic audio")
        x_train, y_train = synthetic_audio_batch(args.seed,
                                                 args.synthetic_examples,
                                                 vcfg.sample_length)
        x_test, y_test = synthetic_audio_batch(args.seed + 1, 32,
                                               vcfg.sample_length)

    _, params = init_prior(jax.random.PRNGKey(args.seed + 2), vcfg, pcfg)
    state = PriorTrainState.create(
        params, default_prior_optimizer(pcfg, accum_steps=args.accum_steps))
    ckpt = CheckpointManager(os.path.join(args.out_dir, "ckpt"))
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")

    monitor = PriorMonitor(
        args.out_dir,
        ckpt_manager=ckpt,
        eval_fn=make_prior_eval_step(vcfg, pcfg, vqvae_params, codebooks),
        val_batch=(jnp.asarray(x_test[: args.batch_size]),
                   jnp.asarray(y_test[: args.batch_size])
                   if pcfg.genre_classes else None),
    )
    state = train_prior(vcfg, pcfg, vqvae_params, codebooks, x_train, y_train,
                        epochs=args.epochs, batch_size=args.batch_size,
                        seed=args.seed, state=state, monitor=monitor)
    ckpt.save(int(state.step), state)
    print(f"done at step {int(state.step)}; checkpoints in {args.out_dir}/ckpt")


if __name__ == "__main__":
    main()
