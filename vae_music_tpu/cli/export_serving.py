"""Export the generation chain as a self-contained serving artifact.

  python -m vae_music_tpu.cli.export_serving --config FULL_PIPELINE \
      --n_samples 256 --out chain.jaxexp \
      [--vqvae_ckpt DIR] [--prior_ckpts DIR ...] \
      [--serve_dtype bfloat16] [--cache_dtype bfloat16]

The artifact embeds all weights as constants; a serving host needs only
jax + a compatible backend to run it (see sample/export.py).
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="FULL_PIPELINE")
    p.add_argument("--n_samples", type=int, default=256)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_labels", action="store_true")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms, e.g. tpu (default: this host's)")
    p.add_argument("--vqvae_ckpt", default=None)
    p.add_argument("--prior_ckpts", nargs="*", default=None)
    p.add_argument("--serve_dtype", default=None)
    p.add_argument("--cache_dtype", default="float32")
    args = p.parse_args()

    import jax

    from vae_music_tpu.configs import get_config
    from vae_music_tpu.sample.export import export_chain
    from vae_music_tpu.sample.sampler import AncestralSampler

    sampler = AncestralSampler.from_config(
        get_config(args.config), jax.random.PRNGKey(args.seed),
        serve_dtype=args.serve_dtype, cache_dtype=args.cache_dtype)
    # Template-free restore: only params/codebooks are read, so checkpoints
    # load regardless of how they were trained (plain Adam, --accum_steps...).
    if args.vqvae_ckpt or args.prior_ckpts:
        from vae_music_tpu.train.checkpoint import restore_sampler

        restore_sampler(sampler, args.vqvae_ckpt, args.prior_ckpts)

    size = export_chain(sampler, args.n_samples, args.out,
                        with_labels=not args.no_labels,
                        platforms=args.platforms)
    print(f"wrote {args.out}: {size} bytes "
          f"(batch {args.n_samples}, platforms {args.platforms or 'host'})")


if __name__ == "__main__":
    main()
