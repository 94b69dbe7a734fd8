"""Generate audio with the full ancestral chain.

  python -m vae_music_tpu.cli.generate --n_samples 4 --genre 3 --out_dir samples/
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="FULL_PIPELINE")
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--genre", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", default="samples")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--mode", choices=["gumbel", "greedy", "top_k", "top_p"], default="gumbel")
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--total_ctx_mult", type=int, default=1,
                   help=">1 generates N context windows of audio via "
                        "overlapping primed windows (arbitrary length)")
    p.add_argument("--overlap_frac", type=float, default=0.5)
    p.add_argument("--vqvae_ckpt", default=None)
    p.add_argument("--prior_ckpts", nargs="*", default=None,
                   help="one checkpoint dir per level (bottom first)")
    p.add_argument("--serve_dtype", default=None,
                   help="e.g. bfloat16: run conditioner/VQ-decoder conv "
                        "stacks in this dtype (the bench serving config)")
    p.add_argument("--cache_dtype", default="float32",
                   help="KV cache dtype; bfloat16 halves decode DMA")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_music_tpu.configs import get_config
    from vae_music_tpu.sample.decode import SampleMode
    from vae_music_tpu.sample.sampler import AncestralSampler
    from vae_music_tpu.train.metrics import write_wav

    scfg = get_config(args.config)
    sampler = AncestralSampler.from_config(
        scfg, jax.random.PRNGKey(args.seed),
        mode=SampleMode(args.mode), temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p, serve_dtype=args.serve_dtype,
        cache_dtype=args.cache_dtype)

    # Template-free restore: only params/codebooks are read, so checkpoints
    # load regardless of how they were trained (plain Adam, --accum_steps...).
    if args.vqvae_ckpt or args.prior_ckpts:
        from vae_music_tpu.train.checkpoint import restore_sampler

        restore_sampler(sampler, args.vqvae_ckpt, args.prior_ckpts)

    y = (jnp.full((args.n_samples,), args.genre, jnp.int32)
         if args.genre is not None else None)
    if args.total_ctx_mult > 1:
        wav = sampler.sample_audio_long(
            args.n_samples, jax.random.PRNGKey(args.seed + 1),
            total_ctx_mult=args.total_ctx_mult,
            overlap_frac=args.overlap_frac, y_genre=y)
    else:
        wav = sampler.sample_audio(args.n_samples,
                                   jax.random.PRNGKey(args.seed + 1), y_genre=y)
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(args.n_samples):
        path = os.path.join(args.out_dir, f"sample{i}.wav")
        write_wav(path, np.asarray(wav[i]))
        print("wrote", path)


if __name__ == "__main__":
    main()
