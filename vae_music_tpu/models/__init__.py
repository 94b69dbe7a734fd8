from vae_music_tpu.models.vqvae import VQVAE, vqvae_apply, vqvae_encode, vqvae_decode
