"""First-class config registry.

The reference keeps hyper-parameters in literal dicts scattered through
``__main__`` blocks (/root/reference/Sampler.py:25-26, /root/reference/vqvae.py:352-353,
/root/reference/prior.py:414-415). Here the three named configs the baseline keys on
(SMALL_VQ_VAE / SMALL_PRIOR / SMALL_UPSAMPLER) are frozen dataclasses in one registry.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class VQVAEConfig:
    """Multi-level VQ-VAE over raw waveforms.

    Mirrors the constructor surface of /root/reference/vqvae.py:30-74: per level
    ``l`` the encoder has depth ``l+1`` using ``down_depth[:l+1]`` / ``strides[:l+1]``,
    so the time-compression (hop) of level ``l`` is ``prod(strides[i]**down_depth[i])``.
    """

    sample_length: int = 28672            # samples per training clip (multiple of top hop)
    channels: int = 1
    levels: int = 2
    latent_dim: int = 64                  # codebook embedding width D
    codebook_size: int = 512              # K
    down_depth: Tuple[int, ...] = (5, 3)
    strides: Tuple[int, ...] = (2, 2)
    residual_width: int = 32
    residual_depth: int = 4
    dilation_factor: int = 3
    commit_beta: float = 0.25             # VectorQuantizer.py:19-21
    ema_decay: float = 0.99               # VectorQuantizer.py:37
    usage_threshold: float = 1.0          # VectorQuantizer.py:22 (dead-code restart)
    use_spectral_loss: bool = True
    dtype: str = "float32"                # compute dtype for conv stacks

    @property
    def hops(self) -> Tuple[int, ...]:
        """Per-level downsample factor (bottom -> top)."""
        hops = []
        acc = 1
        for s, d in zip(self.strides, self.down_depth):
            acc *= s**d
            hops.append(acc)
        return tuple(hops)

    @property
    def z_lengths(self) -> Tuple[int, ...]:
        """Latent code-grid length per level for ``sample_length`` inputs."""
        return tuple(self.sample_length // h for h in self.hops)

    def validate(self) -> "VQVAEConfig":
        assert self.levels == len(self.down_depth) == len(self.strides)
        top_hop = self.hops[-1]
        assert self.sample_length % top_hop == 0, (
            f"sample_length {self.sample_length} must divide top hop {top_hop}"
        )
        return self


@dataclass(frozen=True)
class ConditionerConfig:
    """Upper-level code upsampler net (x_cond_kwargs at /root/reference/Sampler.py:25)."""

    dilation_factor: int = 3
    dilation_cycle: int = 4
    residual_width: int = 32
    residual_depth: int = 8


@dataclass(frozen=True)
class PriorConfig:
    """Autoregressive prior over one VQ level's code grid.

    ``prior_kwargs`` surface of /root/reference/Sampler.py:26 plus the
    level-wiring of /root/reference/prior.py:102-160.  ``bins`` defaults to
    513 = codebook_size + 1 so the start token (bins-1) never collides with a
    real code (/root/reference/Sampler.py:11,
    /root/reference/src/autoregressive/autoregressive_fmha.py:63).
    """

    level: int = 1
    levels: int = 2
    bins: int = 513
    width: int = 128                      # d_model
    depth: int = 6
    heads: int = 2
    blocks: int = 4                       # height of the (blocks x block_len) attention grid
    attn_stacks: int = 1                  # 0: row/col alternating; 1: row/col/prev-row
    m_attn: float = 0.25
    m_mlp: float = 1.0
    dropout: float = 0.0
    pos_emb: bool = True                  # trainable positional embedding (vs sinusoidal)
    genre_classes: Optional[int] = None   # label conditioning when set
    conditioner: Optional[ConditionerConfig] = None  # set for upsampler levels
    teacher_force_rate: float = 0.2       # prior.py:241 scheduled-sampling mix
    warmup_steps: int = 4000              # Noam schedule (multi_head_attention.py:82-101)
    dtype: str = "float32"
    remat: bool = False                   # rematerialize attention blocks (HBM<->FLOPs)
    flash_attention: bool = False         # fused flash kernel for row/prev_row when
                                          # nn.attention.flash_ok — measured SLOWER
                                          # than XLA at the flagship geometry (see
                                          # flash_ok docstring); opt-in for wider blocks

    @property
    def attn_width(self) -> int:
        return int(self.width * self.m_attn)

    @property
    def mlp_width(self) -> int:
        return int(self.width * self.m_mlp)

    def attn_pattern(self, layer: int) -> int:
        """Per-layer attention pattern schedule (transformer.py:82-86).

        0=row, 1=col, 2=prev_row.
        """
        if self.attn_stacks == 0:
            return (0, 1)[layer % 2]
        elif self.attn_stacks == 1:
            return (0, 1, 2)[layer % 3]
        raise ValueError(f"unknown attn_stacks {self.attn_stacks}")


@dataclass(frozen=True)
class SamplerConfig:
    """Multi-level ancestral sampling chain (/root/reference/Sampler.py:10-70)."""

    vqvae: VQVAEConfig = dataclasses.field(default_factory=VQVAEConfig)
    prior_width: int = 128
    prior_depth: int = 6
    prior_heads: int = 2
    prior_blocks: int = 4
    prior_attn_stacks: int = 1
    prior_dropout: float = 0.0
    genre_classes: Optional[int] = None
    conditioner: ConditionerConfig = dataclasses.field(default_factory=ConditionerConfig)

    def prior_config(self, level: int) -> PriorConfig:
        v = self.vqvae
        return PriorConfig(
            level=level,
            levels=v.levels,
            bins=v.codebook_size + 1,
            width=self.prior_width,
            depth=self.prior_depth,
            heads=self.prior_heads,
            blocks=self.prior_blocks,
            attn_stacks=self.prior_attn_stacks,
            dropout=self.prior_dropout,
            genre_classes=self.genre_classes,
            conditioner=self.conditioner if level != v.levels - 1 else None,
        )


# ---------------------------------------------------------------------------
# Named registry — keys match /root/repo/BASELINE.json "configs".
# ---------------------------------------------------------------------------

def _small_vq_vae() -> VQVAEConfig:
    # Single-level dilated-conv VQ-VAE reconstructing ~1s of mono audio @3kHz.
    # 3072 samples = 1.024s, divisible by hop 2**5=32.
    return VQVAEConfig(
        sample_length=3072, levels=1, down_depth=(5,), strides=(2,),
        latent_dim=64, codebook_size=512, residual_width=32, dilation_factor=3,
    ).validate()


def _gtzan_vqvae() -> VQVAEConfig:
    # The 2-level working config at /root/reference/vqvae.py:352-353 (28160 there;
    # 28672 = 256*112 here so both levels' contexts divide blocks=4).
    return VQVAEConfig(
        sample_length=28672, levels=2, down_depth=(5, 3), strides=(2, 2),
        latent_dim=64, codebook_size=512, residual_width=32, dilation_factor=3,
    ).validate()


def _small_prior() -> PriorConfig:
    # Top-level (no x_cond) prior over the level-1 code grid.
    v = _gtzan_vqvae()
    return PriorConfig(
        level=v.levels - 1, levels=v.levels, bins=v.codebook_size + 1,
        width=128, depth=6, heads=2, blocks=4, attn_stacks=1, dropout=0.0,
        genre_classes=10,
    )


def _small_upsampler() -> PriorConfig:
    # Bottom-level prior conditioned on upper-level codes through ConditionerNet.
    v = _gtzan_vqvae()
    return PriorConfig(
        level=0, levels=v.levels, bins=v.codebook_size + 1,
        width=128, depth=6, heads=2, blocks=4, attn_stacks=1, dropout=0.0,
        genre_classes=10, conditioner=ConditionerConfig(),
    )


def _full_pipeline() -> SamplerConfig:
    return SamplerConfig(vqvae=_gtzan_vqvae(), genre_classes=10)


def _jukebox_small_prior() -> PriorConfig:
    # Production-scale geometry matching the Jukebox SMALL_PRIOR dump
    # (/root/reference/SMALL_PRIOR_model_structuree: width 1024, 48 blocks,
    # Embedding(2048,1024), ~160-200M params).  bf16 + remat + tap convs:
    # trains at ~44k tokens/s / 44% MFU on one v5e chip (batch 4, ctx 8192,
    # scripts/bench_train.py); shard 'model' for larger batches.
    return PriorConfig(
        level=0, levels=1, bins=2049, width=1024, depth=48, heads=2,
        blocks=8, attn_stacks=1, dropout=0.0, genre_classes=None,
        dtype="bfloat16", remat=True,
    )


def _jukebox_vqvae() -> VQVAEConfig:
    # Jukebox small_vqvae geometry (SMALL_VQ_VAE_model_structure: 2 levels,
    # hops 32x/256x, K=1024 per the SMALL_* dumps' Embedding(1024, 1024)).
    # sample_length 262144 gives the upsampler its ctx-8192 level-0 grid.
    return VQVAEConfig(
        sample_length=262144, levels=2, down_depth=(5, 3), strides=(2, 2),
        latent_dim=64, codebook_size=1024, residual_width=32,
        dilation_factor=3,
    ).validate()


def _jukebox_chain_top() -> PriorConfig:
    # Chain-wired wide TOP prior: level 1 of the JUKEBOX_VQVAE pair (ctx
    # 262144/256 = 1024, bins = 1024 + 1 start token), same width-1024 /
    # depth-48 transformer geometry as the SMALL_PRIOR dump
    # (/root/reference/SMALL_PRIOR_model_structuree:2).  JUKEBOX_SMALL_PRIOR
    # keeps the dump's standalone ctx-8192/bins-2049 geometry for the
    # training/serving benchmarks; THIS config is what the full wide
    # ancestral chain (top -> ConditionerNet -> upsampler -> VQ decode,
    # /root/reference/Sampler.py:72-109) trains and samples at level 1.
    return PriorConfig(
        level=1, levels=2, bins=1025, width=1024, depth=48, heads=2,
        blocks=8, attn_stacks=1, dropout=0.0, genre_classes=None,
        dtype="bfloat16", remat=True,
    )


def _jukebox_small_upsampler() -> PriorConfig:
    # Production-scale geometry matching the Jukebox SMALL_UPSAMPLER dump
    # (/root/reference/SMALL_UPSAMPLER_model_structure:2-80): conditioner
    # Embedding(1024, 1024) + dilated DecoderConvBlock (width 512, 16
    # residual blocks per upsampling stage, dilation cycle 8 -> 3^7=2187)
    # feeding a width-1024 depth-48 factorized transformer over ctx 8192.
    # The dump counts 218,015,232 params; this instantiates to 282M
    # (transformer 189M, conditioner 82M) because the small-scale reference
    # we mirror uses a k=3 causal-conv QKV (factorized_attention.py:36)
    # where Jukebox uses k=1, and its DecoderConvBlock resnets bottleneck
    # from the embed width rather than running fully at width 512.
    # Pair with the JUKEBOX_VQVAE geometry (cond rate 2**3=8, cond len 1024).
    return PriorConfig(
        level=0, levels=2, bins=1025, width=1024, depth=48, heads=2,
        blocks=8, attn_stacks=1, dropout=0.0, genre_classes=None,
        conditioner=ConditionerConfig(dilation_factor=3, dilation_cycle=8,
                                      residual_width=512, residual_depth=16),
        dtype="bfloat16", remat=True,
    )


CONFIGS = {
    "SMALL_VQ_VAE": _small_vq_vae,
    "GTZAN_VQVAE": _gtzan_vqvae,
    "SMALL_PRIOR": _small_prior,
    "SMALL_UPSAMPLER": _small_upsampler,
    "FULL_PIPELINE": _full_pipeline,
    "JUKEBOX_VQVAE": _jukebox_vqvae,
    "JUKEBOX_SMALL_PRIOR": _jukebox_small_prior,
    "JUKEBOX_CHAIN_TOP": _jukebox_chain_top,
    "JUKEBOX_SMALL_UPSAMPLER": _jukebox_small_upsampler,
}


def get_config(name: str):
    try:
        return CONFIGS[name]()
    except KeyError:
        raise KeyError(f"unknown config {name!r}; available: {sorted(CONFIGS)}")
