from vae_music_tpu.parallel.mesh import create_mesh, batch_sharding, replicated_sharding
from vae_music_tpu.parallel.input import (
    host_local_rows,
    host_local_slice,
    put_global_batch,
)
from vae_music_tpu.parallel.sharding import prior_param_sharding, shard_pytree
from vae_music_tpu.parallel.fsdp import (
    fsdp_sharding,
    fsdp_state_sharding,
    make_prior_train_step_fsdp,
    shard_state,
)
from vae_music_tpu.parallel.ring_attention import sequence_parallel_attention
from vae_music_tpu.parallel.sp_prior import (
    make_prior_train_step_sp,
    make_sp_prior_forward,
)
from vae_music_tpu.parallel.pipeline import (
    make_prior_train_step_pp,
    merge_prior_params,
    pipeline_prior_apply,
    pipeline_transformer_apply,
    split_prior_params,
    stack_layer_params,
    unstack_layer_params,
)
