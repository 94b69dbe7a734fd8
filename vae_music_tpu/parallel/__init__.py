from vae_music_tpu.parallel.mesh import create_mesh, batch_sharding, replicated_sharding
from vae_music_tpu.parallel.sharding import prior_param_sharding, shard_pytree
