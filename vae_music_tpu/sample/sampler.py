"""Multi-level ancestral sampler.

Mirror of /root/reference/Sampler.py:10-109: one prior per level (top included),
sampled top -> bottom; each level's prior conditions on the upper level's
freshly-sampled codes via ``get_cond`` window slicing, then the bottom-level
codes are decoded to audio by the VQ-VAE decoder
(/root/reference/utils/tf_utils.py:184-205 / vqvae.py:253-260).

Unlike the reference (full-prefix recompute per token), every level's token
loop is the jitted KV-cached ``lax.scan`` decode, and the conditioner
upsampling runs once per level before the loop.  The whole chain
(sample top) -> (upsample cond) -> (sample bottom) -> (VQ decode) is a handful
of jitted calls with all state HBM-resident.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from vae_music_tpu.configs import PriorConfig, SamplerConfig, VQVAEConfig
from vae_music_tpu.models.prior import FMHAPrior, build_fmha_prior, get_cond, level_spec
from vae_music_tpu.models.vqvae import vqvae_decode
from vae_music_tpu.sample.decode import SampleMode, make_decode_fn


class AncestralSampler:
    """Holds per-level prior params + the frozen VQ-VAE, samples audio."""

    def __init__(
        self,
        vqvae_cfg: VQVAEConfig,
        prior_cfgs: Sequence[PriorConfig],      # one per level, index == level
        prior_params: Sequence,                  # linen variables per level
        vqvae_params=None,
        codebooks=None,
        *,
        mode: SampleMode = SampleMode.GUMBEL,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        serve_dtype: Optional[str] = None,   # e.g. 'bfloat16' for the conv stacks
        cache_dtype: str = "float32",        # 'bfloat16' halves decode DMA (serving)
        sample_in_kernel: Optional[bool] = None,  # None = auto (fused fast path)
        fused=None,                # None = auto; False/True/'grid' forwarded to
                                   # make_decode_fn ('grid' = the layer-grid
                                   # kernel for deep/wide geometries)
        weight_dtype: str = "float32",  # decode weight streaming dtype
        cond_stream_dtype: Optional[str] = None,  # storage dtype of the
                                   # upsampled conditioning stream (None = f32;
                                   # 'bfloat16' halves the (N, ctx, width)
                                   # buffer — 2.1 GB f32 at the wide geometry)
    ):
        assert len(prior_cfgs) == vqvae_cfg.levels
        self.vqvae_cfg = vqvae_cfg
        self.prior_cfgs = list(prior_cfgs)
        self.prior_params = list(prior_params)
        self.vqvae_params = vqvae_params
        self.codebooks = codebooks
        self.levels = vqvae_cfg.levels
        self.specs = [level_spec(vqvae_cfg, l) for l in range(self.levels)]
        self.models = [build_fmha_prior(vqvae_cfg, c) for c in self.prior_cfgs]
        self.mode = mode
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.serve_dtype = serve_dtype
        self.cache_dtype = cache_dtype
        self.sample_in_kernel = sample_in_kernel
        self.fused = fused
        self.weight_dtype = weight_dtype
        self.cond_stream_dtype = cond_stream_dtype
        self._decode_fns: Dict = {}
        self._cond_fns: Dict = {}
        self._label_fns: Dict = {}
        self._vq_decode_fns: Dict = {}

    @classmethod
    def from_config(cls, cfg: SamplerConfig, rng: jax.Array, **kw) -> "AncestralSampler":
        """Fresh (untrained) sampler — the Sampler.py:28-70 construction path."""
        from vae_music_tpu.models.vqvae import init_vqvae
        from vae_music_tpu.train.prior_step import init_prior

        v_rng, *p_rngs = jax.random.split(rng, cfg.vqvae.levels + 1)
        vqvae_params, codebooks = init_vqvae(v_rng, cfg.vqvae)
        prior_cfgs, prior_params = [], []
        for level in range(cfg.vqvae.levels):
            pc = cfg.prior_config(level)
            _, params = init_prior(p_rngs[level], cfg.vqvae, pc)
            prior_cfgs.append(pc)
            prior_params.append(params)
        return cls(cfg.vqvae, prior_cfgs, prior_params, vqvae_params, codebooks, **kw)

    # -- jitted helpers, cached per (level, batch) ---------------------------

    def _decoder(self, level: int, n_samples: int):
        # The unprimed decoder IS the prime_len=0 windowed decoder; sharing
        # the cache key avoids compiling the same XLA program twice.
        return self._windowed_decoder(level, n_samples, 0)

    def _cond_upsampler(self, level: int):
        if level not in self._cond_fns:
            model = self.models[level]
            if self.serve_dtype is not None:
                import dataclasses

                cfg = dataclasses.replace(self.prior_cfgs[level],
                                          dtype=self.serve_dtype)
                model = build_fmha_prior(self.vqvae_cfg, cfg)
            cdt = jnp.dtype(self.cond_stream_dtype or jnp.float32)
            self._cond_fns[level] = jax.jit(
                lambda p, z: model.apply(p, z, method=FMHAPrior.upsample_cond)
                .astype(cdt))
        return self._cond_fns[level]

    def _vq_decoder(self, level: int):
        if level not in self._vq_decode_fns:
            import dataclasses

            cfg = self.vqvae_cfg
            if self.serve_dtype is not None:
                cfg = dataclasses.replace(cfg, dtype=self.serve_dtype)
            self._vq_decode_fns[level] = jax.jit(
                lambda p, cbs, z: vqvae_decode(p, cbs, cfg, z, level)
                .astype(jnp.float32))
        return self._vq_decode_fns[level]

    def _label_embedder(self, level: int):
        if level not in self._label_fns:
            model = self.models[level]
            self._label_fns[level] = jax.jit(
                lambda p, y: model.apply(p, y, method=FMHAPrior.embed_labels))
        return self._label_fns[level]

    # -- sampling ------------------------------------------------------------

    def sample_codes(
        self,
        n_samples: int,
        rng: jax.Array,
        y_genre: Optional[jnp.ndarray] = None,
    ) -> List[jnp.ndarray]:
        """Top -> bottom ancestral sampling of code grids (Sampler.py:72-109)."""
        zs: List[Optional[jnp.ndarray]] = [None] * self.levels
        for level in reversed(range(self.levels)):
            spec = self.specs[level]
            rng, step_rng = jax.random.split(rng)

            x_cond_stream = None
            if spec.cond_downsample_rate is not None:
                z_cond = get_cond(zs, spec, 0, spec.ctx_len)
                x_cond_stream = self._cond_upsampler(level)(
                    self.prior_params[level], z_cond)

            y_cond = None
            if y_genre is not None and self.prior_cfgs[level].genre_classes is not None:
                y_cond = self._label_embedder(level)(self.prior_params[level], y_genre)

            tokens = self._decoder(level, n_samples)(
                self.prior_params[level], step_rng, x_cond_stream, y_cond)
            # Strip the start token (Sampler.py:105).  A sampled start id
            # decodes to the zero codebook vector, as in the reference.
            zs[level] = tokens[:, 1:]
        return zs  # type: ignore[return-value]

    def sample_audio(
        self,
        n_samples: int,
        rng: jax.Array,
        y_genre: Optional[jnp.ndarray] = None,
        decode_level: int = 0,
    ) -> jnp.ndarray:
        """Full chain: ancestral codes -> VQ-VAE decode -> waveform (N, T, C)."""
        assert self.vqvae_params is not None and self.codebooks is not None
        zs = self.sample_codes(n_samples, rng, y_genre)
        return self._vq_decoder(decode_level)(self.vqvae_params, self.codebooks,
                                              zs[decode_level])

    def sample_audio_staged(
        self,
        n_samples: int,
        rng: jax.Array,
        y_genre: Optional[jnp.ndarray] = None,
        decode_level: int = 0,
    ) -> jnp.ndarray:
        """Peak-HBM-bounded full chain — identical ancestral semantics (and
        identical tokens for a given ``rng``) to :meth:`sample_audio`, but
        every stage is dispatched, blocked on, and its consumed inputs are
        freed before the next stage allocates.

        ``sample_audio``'s all-async dispatch holds every stage's working set
        live at once; at the Jukebox-wide geometry (level-1 caches + the
        ctx-8192 cond stream + level-0's 12 GB int8 caches) that exhausts the
        15.75 GB HBM while this stage-wise residency fits (measured, r5 wide
        soak).  Costs one host RTT per stage (~2 ms each) against a
        multi-second chain wall — use it whenever the chain working set is
        within ~2x of HBM.
        """
        assert self.vqvae_params is not None and self.codebooks is not None

        def free(*arrays):
            for a in arrays:
                for leaf in jax.tree_util.tree_leaves(a):
                    if hasattr(leaf, "delete"):
                        leaf.delete()

        zs: List[Optional[jnp.ndarray]] = [None] * self.levels
        for level in reversed(range(self.levels)):
            spec = self.specs[level]
            rng, step_rng = jax.random.split(rng)

            x_cond_stream = None
            if spec.cond_downsample_rate is not None:
                z_cond = get_cond(zs, spec, 0, spec.ctx_len)
                x_cond_stream = self._cond_upsampler(level)(
                    self.prior_params[level], z_cond)
                jax.block_until_ready(x_cond_stream)
                free(z_cond)
                # The upper level's codes are folded into the stream; free
                # them unless they are the level we decode to audio.
                if level + 1 != decode_level and zs[level + 1] is not None:
                    free(zs[level + 1])
                    zs[level + 1] = None

            y_cond = None
            if (y_genre is not None
                    and self.prior_cfgs[level].genre_classes is not None):
                y_cond = self._label_embedder(level)(
                    self.prior_params[level], y_genre)

            tokens = self._decoder(level, n_samples)(
                self.prior_params[level], step_rng, x_cond_stream, y_cond)
            jax.block_until_ready(tokens)
            if x_cond_stream is not None:
                free(x_cond_stream)
            zs[level] = tokens[:, 1:]

        wav = self._vq_decoder(decode_level)(
            self.vqvae_params, self.codebooks, zs[decode_level])
        jax.block_until_ready(wav)
        return wav

    # -- arbitrary-length generation (beyond one context window) -------------

    def _windowed_decoder(self, level: int, n_samples: int, prime_len: int):
        key = (level, n_samples, prime_len)
        if key not in self._decode_fns:
            self._decode_fns[key] = make_decode_fn(
                self.prior_cfgs[level], self.specs[level].ctx_len, n_samples,
                mode=self.mode, temperature=self.temperature,
                top_k=self.top_k, top_p=self.top_p,
                cache_dtype=self.cache_dtype,
                fused=self.fused, weight_dtype=self.weight_dtype,
                prime_len=prime_len,
                sample_in_kernel=(self.sample_in_kernel if prime_len == 0
                                  else None))
        return self._decode_fns[key]

    def sample_codes_long(
        self,
        n_samples: int,
        rng: jax.Array,
        total_ctx_mult: int = 2,
        overlap_frac: float = 0.5,
        y_genre: Optional[jnp.ndarray] = None,
    ) -> List[jnp.ndarray]:
        """Generate ``total_ctx_mult`` context windows of codes per level with
        overlapping primed windows — arbitrary-length audio, which the
        reference cannot do (its sampler is single-window; ``sample_level``
        is a stub, Sampler.py:111-119).

        Each window re-primes the decoder with the trailing ``overlap_frac``
        of already-generated codes (positions restart per window, matching
        the training distribution of fixed-length clips).
        """
        assert total_ctx_mult >= 1
        assert 0.0 <= overlap_frac < 1.0, "overlap_frac must be in [0, 1)"
        zs: List[Optional[jnp.ndarray]] = [None] * self.levels
        for level in reversed(range(self.levels)):
            spec = self.specs[level]
            ctx = spec.ctx_len
            hop = max(int(ctx * (1.0 - overlap_frac)), 1)
            rate = spec.cond_downsample_rate
            if rate is not None:
                hop = max((hop // rate) * rate, rate)  # window starts align
            prime_len = ctx - hop
            total = ctx * total_ctx_mult

            y_cond = None
            if y_genre is not None and self.prior_cfgs[level].genre_classes is not None:
                y_cond = self._label_embedder(level)(self.prior_params[level],
                                                     y_genre)

            codes = None  # (N, generated_so_far)
            start = 0
            while codes is None or codes.shape[1] < total:
                start = 0 if codes is None else min(codes.shape[1] - prime_len,
                                                    total - ctx)
                x_cond_stream = None
                if rate is not None:
                    # window starts are rate-aligned (hop aligned above), so
                    # get_cond's alignment asserts hold for every window
                    z_cond = get_cond(zs, spec, start, start + ctx)
                    x_cond_stream = self._cond_upsampler(level)(
                        self.prior_params[level], z_cond)
                rng, step_rng = jax.random.split(rng)
                if codes is None or prime_len == 0:
                    tokens = self._windowed_decoder(level, n_samples, 0)(
                        self.prior_params[level], step_rng, x_cond_stream,
                        y_cond)
                    new = tokens[:, 1:]
                    codes = (new if codes is None
                             else jnp.concatenate([codes[:, :start], new],
                                                  axis=1))
                else:
                    prime = codes[:, start : start + prime_len]
                    tokens = self._windowed_decoder(level, n_samples,
                                                    prime_len)(
                        self.prior_params[level], step_rng, x_cond_stream,
                        y_cond, prime)
                    new = tokens[:, 1 + prime_len :]
                    codes = jnp.concatenate(
                        [codes[:, : start + prime_len], new], axis=1)
            zs[level] = codes[:, :total]
        return zs  # type: ignore[return-value]

    def sample_audio_long(
        self,
        n_samples: int,
        rng: jax.Array,
        total_ctx_mult: int = 2,
        overlap_frac: float = 0.5,
        y_genre: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Arbitrary-length generation: (N, sample_length * total_ctx_mult, C)."""
        assert self.vqvae_params is not None and self.codebooks is not None
        zs = self.sample_codes_long(n_samples, rng, total_ctx_mult,
                                    overlap_frac, y_genre)
        return self._vq_decoder(0)(self.vqvae_params, self.codebooks, zs[0])

    # Measured serving sweet spot on v5e (BENCH_r03): per-clip throughput
    # peaks at batch 256 — the decode kernel is HBM-bandwidth-bound there, so
    # larger single-scan batches only grow the per-step working set (more
    # lane tiles, more VMEM pressure) without more overlap: 512-in-one-scan
    # measured 34.9k clips/s vs 41.6k at 256.
    BATCH_CHUNK = 256

    def compile_chain(self, n_samples: int, with_labels: bool = True,
                      batch_chunk: Optional[int] = None,
                      pad_to_fused: bool = True):
        """Build ONE jitted end-to-end program for the whole ancestral chain
        (top sample -> upsample cond -> ... -> VQ decode): a single XLA
        executable for serving, no inter-stage dispatch.

        Returns fn(rng[, y_genre]) -> waveform (N, T, C); prior/VQ-VAE params
        are closed over as compile-time constants.

        Batches beyond the measured sweet spot (``batch_chunk``, default
        ``BATCH_CHUNK``; pass 0 to disable) run as a ``lax.map`` over
        sweet-spot-sized chunks inside the same jitted program, so per-clip
        throughput is monotone in batch size instead of degrading once the
        decode working set outgrows VMEM.  Chunks draw independent RNG
        streams (a chunked batch is NOT sample-identical to an unchunked
        one at the same seed).

        Batches BELOW the fused decode kernel's lane minimum (``n * heads``
        must be a multiple of 128) pad up to it and slice the result
        (``pad_to_fused``): the padded fused chain beats the exact-size XLA
        fallback outright — measured 22.8 ms at padded batch 64 vs 52.6 ms
        at batch 1 / 92.5 ms at batch 16 (flagship, v5e r3) — a 2.3-4x
        latency cut for interactive requests.  Padded lanes draw from the
        same per-lane PRNG streams, so a padded chain is sample-identical
        to the full padded batch's first ``n_samples`` rows, not to an
        unpadded run.
        """
        from vae_music_tpu.sample.decode import make_decode_fn

        import dataclasses

        chunk = self.BATCH_CHUNK if batch_chunk is None else batch_chunk
        if chunk and n_samples > chunk:
            # Non-multiple batches run floor(n/chunk) sweet-spot chunks via
            # lax.map plus ONE remainder-sized chain in the same program (a
            # remainder too small/misaligned for the fused kernel pads up to
            # the lane minimum like any small batch) — never a silent
            # fall-through to the measured-slower single oversized scan.
            inner = self._chain_body(chunk, with_labels)
            n_chunks = n_samples // chunk
            rem = n_samples - n_chunks * chunk
            inner_rem = (self._chain_body_padded(rem, with_labels,
                                                 pad_to_fused)
                         if rem else None)

            def chunked(rng, y_genre=None):
                rngs = jax.random.split(rng, n_chunks + 1)
                y_full = None if y_genre is None else y_genre[:n_chunks * chunk]
                if y_genre is None:
                    wav = jax.lax.map(lambda r: inner(r, None),
                                      rngs[:n_chunks])
                else:
                    wav = jax.lax.map(
                        lambda rv: inner(rv[0], rv[1]),
                        (rngs[:n_chunks], y_full.reshape(n_chunks, chunk)))
                wav = wav.reshape((n_chunks * chunk,) + wav.shape[2:])
                if inner_rem is not None:
                    y_rem = None if y_genre is None else y_genre[-rem:]
                    wav = jnp.concatenate(
                        [wav, inner_rem(rngs[-1], y_rem)], axis=0)
                return wav

            if with_labels:
                return jax.jit(chunked)
            return jax.jit(lambda rng: chunked(rng, None))

        chain = self._chain_body_padded(n_samples, with_labels, pad_to_fused)
        if with_labels:
            return jax.jit(chain)
        return jax.jit(lambda rng: chain(rng, None))

    def _fused_pad_batch(self, n_samples: int) -> int:
        """Smallest batch >= n_samples whose lane count (n * heads) is a
        multiple of the fused kernel's LANE at EVERY level; ``n_samples``
        unchanged when the kernel is unavailable on this backend (CPU/GPU)
        or the batch already qualifies."""
        import math

        from vae_music_tpu.ops.decode_pallas import (
            LANE, decode_pallas_available)

        if not decode_pallas_available():
            return n_samples
        step = 1
        for l in range(self.levels):
            h = self.prior_cfgs[l].heads
            s = LANE // math.gcd(LANE, h)
            step = step * s // math.gcd(step, s)
        return -(-n_samples // step) * step

    def _chain_body_padded(self, n_samples: int, with_labels: bool,
                           pad_to_fused: bool):
        """``_chain_body`` at the fused lane minimum, output sliced back to
        ``n_samples`` (see compile_chain's pad_to_fused note)."""
        m = self._fused_pad_batch(n_samples) if pad_to_fused else n_samples
        if m == n_samples:
            return self._chain_body(n_samples, with_labels)
        inner = self._chain_body(m, with_labels)

        def padded(rng, y_genre=None):
            y_pad = (None if y_genre is None
                     else jnp.pad(y_genre, (0, m - n_samples)))
            return inner(rng, y_pad)[:n_samples]

        return padded

    def _chain_body(self, n_samples: int, with_labels: bool = True):
        """The un-jitted single-chunk chain closure (see compile_chain)."""
        from vae_music_tpu.sample.decode import make_decode_fn

        import dataclasses

        decode_fns = [
            make_decode_fn(self.prior_cfgs[l], self.specs[l].ctx_len,
                           n_samples, mode=self.mode,
                           temperature=self.temperature, top_k=self.top_k,
                           top_p=self.top_p,
                           cache_dtype=self.cache_dtype,
                           fused=self.fused, weight_dtype=self.weight_dtype,
                           sample_in_kernel=self.sample_in_kernel)
            for l in range(self.levels)
        ]
        prior_params = self.prior_params
        vq_params, codebooks = self.vqvae_params, self.codebooks
        cfg = self.vqvae_cfg
        cond_models = self.models
        if self.serve_dtype is not None:
            cfg = dataclasses.replace(cfg, dtype=self.serve_dtype)
            cond_models = [
                build_fmha_prior(self.vqvae_cfg,
                                 dataclasses.replace(c, dtype=self.serve_dtype))
                for c in self.prior_cfgs
            ]

        def chain(rng, y_genre=None):
            zs: List = [None] * self.levels
            for level in reversed(range(self.levels)):
                spec = self.specs[level]
                rng, step_rng = jax.random.split(rng)
                x_cond = None
                if spec.cond_downsample_rate is not None:
                    z_cond = get_cond(zs, spec, 0, spec.ctx_len)
                    x_cond = cond_models[level].apply(
                        prior_params[level], z_cond,
                        method=FMHAPrior.upsample_cond).astype(
                            jnp.dtype(self.cond_stream_dtype or jnp.float32))
                y_cond = None
                if y_genre is not None and self.prior_cfgs[level].genre_classes:
                    y_cond = self.models[level].apply(
                        prior_params[level], y_genre,
                        method=FMHAPrior.embed_labels)
                tokens = decode_fns[level](prior_params[level], step_rng,
                                           x_cond, y_cond)
                zs[level] = tokens[:, 1:]
            return vqvae_decode(vq_params, codebooks, cfg, zs[0], 0).astype(
                jnp.float32)

        return chain

    def compile_chain_sharded(self, n_samples: int, mesh, axis: str = "data",
                              with_labels: bool = True):
        """Data-parallel serving: ONE jitted program whose generation batch is
        sharded over ``mesh``'s ``axis``.  Each device runs the full ancestral
        chain (decode scans + conditioner + VQ decoder) on its batch shard
        with replicated params — generation has no cross-sample interaction,
        so serving scales linearly over the mesh with zero collectives.

        The per-shard RNG is ``fold_in(rng, axis_index)`` so shards draw
        independent streams.  Returns fn(rng[, y_genre]) -> (N, T, C) with
        the batch dimension sharded over ``axis``.
        """
        import inspect

        from jax.sharding import PartitionSpec as P

        try:  # jax >= 0.7 promotes shard_map out of experimental
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map

        # The replication-check kwarg was renamed check_rep -> check_vma.
        rep_kwarg = ("check_vma" if "check_vma"
                     in inspect.signature(shard_map).parameters
                     else "check_rep")

        n_dev = mesh.shape[axis]
        assert n_samples % n_dev == 0, (n_samples, n_dev)
        local = self.compile_chain(n_samples // n_dev, with_labels=with_labels)

        if with_labels:
            def body(rng, y):
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
                return local(rng, y)

            fn = shard_map(body, mesh=mesh, in_specs=(P(), P(axis)),
                           out_specs=P(axis), **{rep_kwarg: False})
        else:
            def body(rng):
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
                return local(rng)

            fn = shard_map(body, mesh=mesh, in_specs=(P(),),
                           out_specs=P(axis), **{rep_kwarg: False})
        return jax.jit(fn)
