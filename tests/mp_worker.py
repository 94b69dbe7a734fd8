"""Worker process for the genuine multi-process (multi-host) tests.

Spawned by tests/test_multiprocess.py — two OS processes, each owning 4
virtual CPU devices (8 global), federated through ``jax.distributed`` with
gloo CPU collectives.  This is the same code path a real multi-host TPU pod
runs: per-process local devices, ``make_array_from_process_local_data`` for
input, GSPMD cross-process collectives for the train step.  The reference
has no multi-host story at all (SURVEY.md §2.2).

Not collected by pytest (no ``test_`` prefix).  Heavy imports live inside
functions so the parent test can import the shared helpers (`tiny_cfg`,
`global_batch`) without re-initializing jax.
"""

from __future__ import annotations

import json
import os
import sys

N_PROCS = 2
LOCAL_DEVICES = 4
GLOBAL_BATCH = 8
SLICE_N = 19  # deliberately not divisible by N_PROCS (remainder semantics)


def tiny_cfg():
    from vae_music_tpu.configs import VQVAEConfig

    return VQVAEConfig(
        sample_length=1024, levels=1, latent_dim=8, codebook_size=16,
        down_depth=(3,), strides=(2,), residual_width=8, residual_depth=2,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()


def global_batch(cfg):
    """Deterministic global batch — identical on every process."""
    import numpy as np

    from vae_music_tpu.data.audio import synthetic_audio_batch

    x, _ = synthetic_audio_batch(0, GLOBAL_BATCH, cfg.sample_length)
    return np.asarray(x, np.float32)


def reference_step(cfg, x):
    """The single-process train step the multi-process run must match."""
    import jax
    import jax.numpy as jnp
    import optax

    from vae_music_tpu.models.vqvae import init_vqvae
    from vae_music_tpu.train.state import VQVAETrainState
    from vae_music_tpu.train.vqvae_step import make_vqvae_train_step

    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    state = VQVAETrainState.create(params, cbs, optax.adam(1e-3))
    step = make_vqvae_train_step(cfg, donate=False)
    new_state, metrics = step(state, jnp.asarray(x), jax.random.PRNGKey(1))
    return {
        "loss": float(metrics["loss"]),
        "emb_sum": float(jnp.sum(new_state.codebooks[0].embeddings)),
        "param_l2": float(sum(float(jnp.vdot(p, p))
                              for p in jax.tree.leaves(new_state.params))),
    }


def main():
    pid, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    # conftest-style backend init: this environment's sitecustomize ignores
    # shell-env XLA_FLAGS/JAX_PLATFORMS combinations, so mutate XLA_FLAGS
    # in-process BEFORE first backend use and pick the platform via config
    # (mirrors tests/conftest.py).
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    os.environ.pop("JAX_PLATFORMS", None)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/vmt_jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=N_PROCS, process_id=pid)

    import jax.numpy as jnp
    import optax

    from vae_music_tpu.models.vqvae import init_vqvae
    from vae_music_tpu.parallel.input import (
        host_local_rows,
        host_local_slice,
        put_global_batch,
    )
    from vae_music_tpu.parallel.mesh import batch_sharding, create_mesh
    from vae_music_tpu.train.state import VQVAETrainState
    from vae_music_tpu.train.vqvae_step import make_vqvae_train_step

    assert jax.process_count() == N_PROCS
    assert jax.local_device_count() == LOCAL_DEVICES
    assert len(jax.devices()) == N_PROCS * LOCAL_DEVICES

    out = {"pid": pid}

    # 1) per-host epoch slice: ceil-split with wrap on the remainder —
    #    the two chunks must jointly cover range(SLICE_N).
    out["slice"] = [int(v) for v in host_local_slice(SLICE_N, seed=7, epoch=2)]

    # 2) global-batch assembly from process-LOCAL rows only.
    cfg = tiny_cfg()
    x = global_batch(cfg)
    rows = host_local_rows(GLOBAL_BATCH)
    assert rows == GLOBAL_BATCH // N_PROCS
    mesh = create_mesh()  # all 8 global devices on 'data'
    sharding = batch_sharding(mesh)
    xb = put_global_batch(x[pid * rows:(pid + 1) * rows], sharding)
    assert xb.shape[0] == GLOBAL_BATCH
    out["global_mean"] = float(jax.jit(jnp.mean)(xb))
    out["expect_mean"] = float(x.mean())

    # 3) a REAL DP train step over the two processes: GSPMD inserts the
    #    cross-process gradient/EMA reductions (gloo).  Scalars below are
    #    replicated, so each process can fetch and report them.
    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    state = VQVAETrainState.create(params, cbs, optax.adam(1e-3))
    step = make_vqvae_train_step(cfg, donate=False)
    new_state, metrics = step(state, xb, jax.random.PRNGKey(1))
    out["loss"] = float(metrics["loss"])
    out["emb_sum"] = float(jnp.sum(new_state.codebooks[0].embeddings))
    out["param_l2"] = float(sum(float(jnp.vdot(p, p))
                                for p in jax.tree.leaves(new_state.params)))

    with open(os.path.join(outdir, f"out_{pid}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
