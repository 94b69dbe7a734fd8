from vae_music_tpu.ops.vq_pallas import fused_vq_assign, vq_pallas_available
