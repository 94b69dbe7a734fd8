"""Test configuration: force the CPU backend with 8 virtual devices so
mesh/collective logic (DP grad reductions, codebook EMA psum, TP shardings)
is exercised without a TPU pod (SURVEY.md §4 multi-device strategy)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: jit compiles dominate suite wall-time; repeat
# runs (CI, the fast tier during development) skip them entirely.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/vmt_jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

# Build the native C++ audio loader if its .so is missing (it is a build
# artifact, not committed) so the native-loader tests run instead of
# skipping on a fresh checkout.
def _ensure_native_loader():
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(repo, "runtime", "build", "libaudio_loader.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.join(repo, "runtime")],
                           check=False, capture_output=True, timeout=120)
        except Exception:
            pass  # tests fall back to their skipif guard


_ensure_native_loader()
