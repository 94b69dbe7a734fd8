from vae_music_tpu.train.state import VQVAETrainState, PriorTrainState
from vae_music_tpu.train.vqvae_step import make_vqvae_train_step, make_vqvae_eval_step
from vae_music_tpu.train.optim import (
    init_param_ema,
    update_param_ema,
    with_grad_accumulation,
)
from vae_music_tpu.train.prior_step import (
    default_prior_optimizer,
    make_prior_grad_fn,
    make_prior_train_step,
)
from vae_music_tpu.train.metrics import HistogramLogger
