from vae_music_tpu.models.vqvae import VQVAE, vqvae_apply, vqvae_encode, vqvae_decode
from vae_music_tpu.models.prior import FMHAPrior, build_fmha_prior, level_spec
from vae_music_tpu.models.autoregressive import MHAAutoregressive, make_dense_decode_fn
from vae_music_tpu.models.pixelcnn import (
    PixelCNN,
    make_pixelcnn_sampler,
    pixelcnn_log_prob,
)
from vae_music_tpu.models.cvae import CVAE, CVAEMulaw
from vae_music_tpu.models.conditioners import ConditionerNet, LabelConditioner
