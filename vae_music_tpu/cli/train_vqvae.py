"""Train the multi-level VQ-VAE.

Reconstructs the reference's missing trainer-notebook flow: dataset ->
VQVAE.fit with VQVAEMonitor (checkpoints, validation, reconstruction dumps).

  python -m vae_music_tpu.cli.train_vqvae --config GTZAN_VQVAE \
      --data_dir /data/gtzan --out_dir runs/vqvae --epochs 100
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="GTZAN_VQVAE")
    p.add_argument("--data_dir", default=None,
                   help="GTZAN root (genre subdirs); synthetic data if omitted")
    p.add_argument("--out_dir", default="runs/vqvae")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt_interval", type=int, default=10)
    p.add_argument("--val_interval", type=int, default=5)
    p.add_argument("--inspect_interval", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--synthetic_examples", type=int, default=256)
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microsteps per optimizer update "
                        "(codebook EMA still updates every microstep)")
    args = p.parse_args()

    import jax
    import numpy as np
    import optax

    from vae_music_tpu.configs import get_config
    from vae_music_tpu.data.audio import synthetic_audio_batch
    from vae_music_tpu.models.vqvae import init_vqvae
    from vae_music_tpu.train.checkpoint import CheckpointManager
    from vae_music_tpu.train.loop import make_inspect_fn, train_vqvae
    from vae_music_tpu.train.monitors import VQVAEMonitor
    from vae_music_tpu.train.state import VQVAETrainState
    from vae_music_tpu.train.vqvae_step import make_vqvae_eval_step

    cfg = get_config(args.config).validate()

    if args.data_dir:
        from vae_music_tpu.data.gtzan import read_data, GENRES

        window = cfg.sample_length / (30 * 3000)
        x_train, y_train, _f, x_test, y_test, _ft = read_data(
            args.data_dir, GENRES, split_window=window, split_overlap=0.5,
            max_signal_len=90000, shuffle_after_split=True)
        x_train = np.transpose(x_train, (0, 2, 1)).astype(np.float32)
        x_test = np.transpose(x_test, (0, 2, 1)).astype(np.float32)
    else:
        print("no --data_dir: using synthetic audio")
        x_train, y_train = synthetic_audio_batch(args.seed,
                                                 args.synthetic_examples,
                                                 cfg.sample_length)
        x_test, y_test = synthetic_audio_batch(args.seed + 1, 32, cfg.sample_length)

    params, codebooks = init_vqvae(jax.random.PRNGKey(args.seed), cfg)
    from vae_music_tpu.train.optim import with_grad_accumulation

    tx = with_grad_accumulation(optax.adam(args.learning_rate), args.accum_steps)
    state = VQVAETrainState.create(params, codebooks, tx)

    ckpt = CheckpointManager(os.path.join(args.out_dir, "ckpt"))
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {int(state.step)}")

    import jax.numpy as jnp

    monitor = VQVAEMonitor(
        args.out_dir,
        ckpt_manager=ckpt,
        eval_fn=make_vqvae_eval_step(cfg),
        val_batch=jnp.asarray(x_test[: args.batch_size]),
        inspect_fn=make_inspect_fn(cfg),
        inspect_batch=jnp.asarray(x_test[:4]),
        ckpt_interval=args.ckpt_interval,
        val_interval=args.val_interval,
        inspect_interval=args.inspect_interval,
    )
    state = train_vqvae(cfg, x_train, epochs=args.epochs,
                        batch_size=args.batch_size,
                        learning_rate=args.learning_rate,
                        seed=args.seed, state=state, monitor=monitor)
    ckpt.save(int(state.step), state)
    print(f"done at step {int(state.step)}; checkpoints in {args.out_dir}/ckpt")


if __name__ == "__main__":
    main()
