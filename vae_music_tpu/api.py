"""User-facing facade mirroring the reference's public API surface.

A user of the reference interacts with four objects (SURVEY.md §1 public
interfaces):

  * ``VQVAE``        (/root/reference/vqvae.py:24)   — train_step/test_step/
                     call/encode/decode over raw waveforms
  * ``Prior``        (/root/reference/prior.py:102)  — binds a frozen VQVAE,
                     train_step/test_step/call/sample/get_cond for one level
  * ``VQVAESampler`` (/root/reference/Sampler.py:10) — multi-level ancestral
                     sampling
  * data/eval utils  (data_utils.py, utils/tf_utils.py)

These classes wrap the functional core (explicit states, jitted steps) in
that shape, so reference users can migrate 1:1.  New code should prefer the
functional API (vae_music_tpu.train.*, vae_music_tpu.sample.*) directly.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from vae_music_tpu.configs import ConditionerConfig, PriorConfig, SamplerConfig, VQVAEConfig
from vae_music_tpu.models import prior as prior_lib
from vae_music_tpu.models import vqvae as vqvae_lib
from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
from vae_music_tpu.sample.sampler import AncestralSampler
from vae_music_tpu.train.prior_step import (
    default_prior_optimizer,
    init_prior,
    make_prior_eval_step,
    make_prior_train_step,
)
from vae_music_tpu.train.state import PriorTrainState, VQVAETrainState
from vae_music_tpu.train.vqvae_step import make_vqvae_eval_step, make_vqvae_train_step


class VQVAE:
    """Multi-level VQ-VAE with the reference's method surface (vqvae.py:24-260)."""

    def __init__(self, cfg: VQVAEConfig, *, learning_rate: float = 3e-4,
                 seed: int = 0):
        self.cfg = cfg.validate()
        params, codebooks = vqvae_lib.init_vqvae(jax.random.PRNGKey(seed), cfg)
        self.state = VQVAETrainState.create(params, codebooks,
                                            optax.adam(learning_rate))
        self._train_step = make_vqvae_train_step(cfg, donate=False)
        self._eval_step = make_vqvae_eval_step(cfg)
        self._rng = jax.random.PRNGKey(seed + 1)
        self._encode = jax.jit(
            lambda p, c, x: vqvae_lib.vqvae_encode(p, c, cfg, x))
        self._decode = {}

    @property
    def levels(self) -> int:
        return self.cfg.levels

    @property
    def codebooks(self):
        return self.state.codebooks

    @property
    def params(self):
        return self.state.params

    def train_step(self, x: jnp.ndarray) -> dict:
        """One optimization step over a waveform batch (vqvae.py:111-146)."""
        self.state, metrics = self._train_step(self.state, jnp.asarray(x), self._rng)
        return {k: float(v) for k, v in metrics.items()}

    def test_step(self, x: jnp.ndarray) -> dict:
        return {k: float(v) for k, v in
                self._eval_step(self.state, jnp.asarray(x)).items()}

    def __call__(self, x: jnp.ndarray):
        """Per-level reconstructions + loss dict (vqvae.py:178-206)."""
        recons, total, _cbs, metrics = vqvae_lib.vqvae_apply(
            self.state.params, self.state.codebooks, self.cfg, jnp.asarray(x))
        return recons, metrics

    def encode(self, x: jnp.ndarray, start_level: int = 0,
               end_level: Optional[int] = None) -> List[jnp.ndarray]:
        zs = self._encode(self.state.params, self.state.codebooks, jnp.asarray(x))
        end_level = self.cfg.levels if end_level is None else end_level
        return zs[start_level:end_level]

    def decode(self, zq: jnp.ndarray, level: int = 0) -> jnp.ndarray:
        if level not in self._decode:
            cfg = self.cfg
            self._decode[level] = jax.jit(
                lambda p, c, z: vqvae_lib.vqvae_decode(p, c, cfg, z, level))
        return self._decode[level](self.state.params, self.state.codebooks,
                                   jnp.asarray(zq))


class Prior:
    """One prior/upsampler level bound to a frozen VQVAE (prior.py:102-408)."""

    def __init__(self, level: int, vqvae: VQVAE, *,
                 prior_cfg: Optional[PriorConfig] = None,
                 genre_classes: Optional[int] = 10, seed: int = 0):
        vcfg = vqvae.cfg
        if prior_cfg is None:
            prior_cfg = PriorConfig(
                level=level, levels=vcfg.levels, bins=vcfg.codebook_size + 1,
                genre_classes=genre_classes,
                conditioner=(ConditionerConfig()
                             if level != vcfg.levels - 1 else None))
        self.cfg = prior_cfg
        self.level = level
        self.vqvae = vqvae
        self.spec = prior_lib.level_spec(vcfg, level)
        self.context_length = self.spec.ctx_len
        self.model, params = init_prior(jax.random.PRNGKey(seed), vcfg, prior_cfg)
        self.state = PriorTrainState.create(params,
                                            default_prior_optimizer(prior_cfg))
        self._train_step = make_prior_train_step(
            vcfg, prior_cfg, vqvae.params, vqvae.codebooks, donate=False)
        self._eval_step = make_prior_eval_step(
            vcfg, prior_cfg, vqvae.params, vqvae.codebooks)
        self._rng = jax.random.PRNGKey(seed + 1)
        self._decoders = {}
        self._cond = jax.jit(lambda p, z: self.model.apply(
            p, z, method=prior_lib.FMHAPrior.upsample_cond))
        self._labels = (jax.jit(lambda p, y: self.model.apply(
            p, y, method=prior_lib.FMHAPrior.embed_labels))
            if prior_cfg.genre_classes else None)

    def get_cond(self, zs: Sequence[jnp.ndarray], start: int, end: int):
        """Upper-level code window for [start, end) (prior.py:186-195)."""
        return prior_lib.get_cond(zs, self.spec, start, end)

    def train_step(self, x, y=None) -> dict:
        self.state, metrics = self._train_step(
            self.state, jnp.asarray(x),
            jnp.asarray(y) if y is not None else None, self._rng)
        return {k: float(v) for k, v in metrics.items()}

    def test_step(self, x, y=None) -> dict:
        return {k: float(v) for k, v in self._eval_step(
            self.state, jnp.asarray(x),
            jnp.asarray(y) if y is not None else None).items()}

    def __call__(self, x, y=None):
        """Teacher-forced forward over raw audio: (logits, targets, loss, acc)
        (prior.py:200-238)."""
        zs = vqvae_lib.vqvae_encode(self.vqvae.params, self.vqvae.codebooks,
                                    self.vqvae.cfg, jnp.asarray(x),
                                    self.level, self.vqvae.levels)
        target = zs[0]
        upper = zs[1] if self.cfg.conditioner is not None else None
        tokens = prior_lib.shift_right_with_start(target, self.cfg.bins - 1)
        y_cond = (self._labels(self.state.params, jnp.asarray(y))
                  if (y is not None and self._labels) else None)
        logits, _ = self.model.apply(self.state.params, tokens, upper, y_cond)
        loss = prior_lib.token_loss(target, logits)
        acc = prior_lib.token_accuracy(target, logits)
        return logits, target, loss, acc

    def sample(self, n_samples: int, z_cond=None, y=None,
               rng: Optional[jax.Array] = None,
               mode: SampleMode = SampleMode.GUMBEL,
               temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0,
               prime=None) -> jnp.ndarray:
        """Sample one context window of codes (prior.py:374-408).

        ``prime`` (n_samples, P) int codes teacher-force the first P positions
        (continuation sampling — the reference stubs this, Sampler.py:111-119).
        Returns (n_samples, ctx_len + 1) tokens incl. the start token.
        """
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        prime_len = 0 if prime is None else int(prime.shape[1])
        key = (n_samples, mode, temperature, top_k, top_p, prime_len)
        if key not in self._decoders:
            self._decoders[key] = make_decode_fn(self.cfg, self.context_length,
                                                 n_samples, mode=mode,
                                                 temperature=temperature,
                                                 top_k=top_k, top_p=top_p,
                                                 prime_len=prime_len)
        x_cond = (self._cond(self.state.params, jnp.asarray(z_cond))
                  if z_cond is not None else None)
        y_cond = (self._labels(self.state.params, jnp.asarray(y))
                  if (y is not None and self._labels) else None)
        if prime is None:
            return self._decoders[key](self.state.params, rng, x_cond, y_cond)
        return self._decoders[key](self.state.params, rng, x_cond, y_cond,
                                   jnp.asarray(prime))

    def random_sample(self, seq_length: Optional[int] = None,
                      z_cond=None, y=None,
                      iterations: int = 10, batch_per_iter: int = 4,
                      token_freq: float = 0.50,
                      rng: Optional[jax.Array] = None):
        """Best-of-N random-search sampling
        (autoregressive_fmha.py:242-302).  Returns (best_tokens, best_loss).

        ``z_cond``/``y`` condition BOTH the candidate decode and the scoring
        forward, matching the reference (which threads the same x_cond/y_cond
        through sample and loss, autoregressive_fmha.py:258-267).  Candidate
        selection runs on-device; no per-iteration host syncs.
        """
        from vae_music_tpu.sample.search import make_score_fn, random_sample

        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        seq_length = self.context_length if seq_length is None else seq_length
        key = ("search", batch_per_iter, SampleMode.GUMBEL, seq_length)
        if key not in self._decoders:
            self._decoders[key] = make_decode_fn(self.cfg, seq_length,
                                                 batch_per_iter)
        x_cond = (self._cond(self.state.params, jnp.asarray(z_cond))
                  if z_cond is not None else None)
        y_cond = (self._labels(self.state.params, jnp.asarray(y))
                  if (y is not None and self._labels) else None)
        score = make_score_fn(self.model, x_cond=x_cond, y_cond=y_cond)
        return random_sample(self._decoders[key], score, self.state.params,
                             rng, bins=self.cfg.bins, iterations=iterations,
                             token_freq=token_freq,
                             decode_args=(x_cond, y_cond))


class VQVAESampler:
    """Multi-level ancestral sampler facade (Sampler.py:10-109)."""

    def __init__(self, vqvae: VQVAE, priors: Sequence[Prior], **kw):
        assert len(priors) == vqvae.levels
        self.vqvae = vqvae
        self.priors = list(priors)
        self._sampler = AncestralSampler(
            vqvae.cfg, [p.cfg for p in priors], [p.state.params for p in priors],
            vqvae.params, vqvae.codebooks, **kw)

    def sample(self, n_samples: int, y_genre=None,
               rng: Optional[jax.Array] = None) -> List[jnp.ndarray]:
        """Top -> bottom code grids per level (Sampler.py:72-109)."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        y = jnp.asarray(y_genre) if y_genre is not None else None
        # refresh params in case priors trained since construction
        return self._refresh().sample_codes(n_samples, rng, y)

    def sample_audio(self, n_samples: int, y_genre=None,
                     rng: Optional[jax.Array] = None) -> jnp.ndarray:
        rng = jax.random.PRNGKey(0) if rng is None else rng
        y = jnp.asarray(y_genre) if y_genre is not None else None
        return self._refresh().sample_audio(n_samples, rng, y)

    def sample_audio_long(self, n_samples: int, total_ctx_mult: int = 2,
                          overlap_frac: float = 0.5, y_genre=None,
                          rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Arbitrary-length generation via overlapping primed windows —
        beyond the reference's single-window sampler (Sampler.py:111-119)."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        y = jnp.asarray(y_genre) if y_genre is not None else None
        return self._refresh().sample_audio_long(n_samples, rng,
                                                 total_ctx_mult,
                                                 overlap_frac, y)

    def _refresh(self):
        self._sampler.prior_params = [p.state.params for p in self.priors]
        self._sampler.vqvae_params = self.vqvae.params
        self._sampler.codebooks = self.vqvae.codebooks
        return self._sampler

    def compile_chain(self, n_samples: int, **kw):
        """ONE jitted serving program for the whole chain (beyond-reference)."""
        return self._refresh().compile_chain(n_samples, **kw)

    def compile_chain_sharded(self, n_samples: int, mesh, **kw):
        """Batch-sharded multi-chip serving (docs/PARALLELISM.md)."""
        return self._refresh().compile_chain_sharded(n_samples, mesh, **kw)

    def export(self, n_samples: int, path: str, **kw) -> int:
        """Serialize the serving chain to a jax.export artifact; a serving
        host needs only jax to run it (sample/export.py)."""
        from vae_music_tpu.sample.export import export_chain

        return export_chain(self._refresh(), n_samples, path, **kw)
