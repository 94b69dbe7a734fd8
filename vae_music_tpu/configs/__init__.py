from vae_music_tpu.configs.registry import (
    VQVAEConfig,
    ConditionerConfig,
    PriorConfig,
    SamplerConfig,
    CONFIGS,
    get_config,
)
