from vae_music_tpu.data.stft import STFT_ARGS, spectral, frobenius_norm, multiscale_spectral_loss
from vae_music_tpu.data.audio import mu_law_encode, mu_law_decode, synthetic_audio_batch
