"""Benchmark CLI — runs the repo-root harness (one JSON line).

  python -m vae_music_tpu.cli.benchmark [--profile_dir DIR]

With --profile_dir, wraps the run in a jax.profiler trace (Perfetto) —
the reference has no profiler at all (SURVEY.md §5).
"""

import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--profile_dir", default=None)
    args = p.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import bench

    if args.profile_dir:
        from vae_music_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            bench.main()
        print(f"profile trace written to {args.profile_dir}", file=sys.stderr)
    else:
        bench.main()


if __name__ == "__main__":
    main()
