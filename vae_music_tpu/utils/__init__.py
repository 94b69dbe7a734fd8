from vae_music_tpu.utils.shapes import assert_shape, prod
