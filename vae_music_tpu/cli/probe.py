"""Environment probe CLI (analogue of /root/reference/main.py:1-21)."""

import argparse


def main():
    parser = argparse.ArgumentParser(description="vae_music_tpu device probe")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    import jax

    print(f"jax {jax.__version__}")
    print(f"default backend: {jax.default_backend()}")
    for d in jax.devices():
        print(f"  {d.platform}: {d}")
    if args.verbose:
        import flax
        import optax

        print(f"flax {flax.__version__}, optax {optax.__version__}")
        print(f"local device count: {jax.local_device_count()}")


if __name__ == "__main__":
    main()
