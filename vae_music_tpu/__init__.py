"""vae_music_tpu — a TPU-native (JAX / XLA / Pallas / pjit) music generation framework.

A ground-up re-design of the capabilities of
``sunzeyucmu/VAE-based-Music--Deep-Generative-Models`` (a TF2/Keras re-implementation
of the OpenAI Jukebox pipeline at small scale):

  * multi-level dilated-conv VQ-VAE over raw waveforms (EMA codebooks,
    straight-through gradients, dead-code restarts, multiscale spectral loss)
  * autoregressive priors: Jukebox-style factorized/sparse-attention transformer,
    a vanilla dense-attention transformer, and a PixelCNN lineage
  * upsampler priors conditioned on upper-level codes + genre-label conditioning
  * an ancestral sampler chaining top prior -> upsamplers -> VQ-VAE decoder

Design stance (TPU-first, NOT a TF translation):
  * pure-functional train steps ``step(state, batch, rng) -> (state, metrics)``;
    the VQ/EMA codebook state is explicit in the train state (no hidden assigns)
  * GSPMD: one global program, ``jax.sharding.Mesh`` + ``NamedSharding``;
    XLA inserts the collectives (grad reductions and codebook-EMA statistics
    become cross-replica automatically)
  * static shapes everywhere; token decode is a jitted ``lax.scan`` with
    HBM-resident per-pattern KV caches (the reference recomputes the full
    prefix every token — see /root/reference/src/autoregressive/autoregressive_fmha.py:199-203)
  * Pallas kernels for the hot ops (codebook nearest-neighbour + EMA statistics,
    blockwise factorized attention) with jnp/lax reference fallbacks.
"""

__version__ = "0.1.0"
