"""Custom TPU kernels (Pallas) + the benchmark-driven dispatch policy.

Per the build plan (SURVEY.md §7 stage 3): implement fused kernels for the
hot numeric paths, benchmark against the XLA baseline, keep whichever wins
per shape.  Measured on TPU v5e:

  * VQ codebook assignment+EMA (vq_pallas.py): measured on the v5e chip
    (assignment + EMA statistics, D=64 K=512): 28672 rows (flagship encode
    batch) pallas 0.82ms vs XLA 1.12ms (1.37x — the (N,K) distance matrix
    stays in VMEM); 262144 rows ~tie (2.43ms vs 2.49ms, both HBM-bound).
    Auto-dispatched by quantize(use_pallas=None): kernel on a TPU backend
    (single chip, or any chip count when the caller passes a mesh —
    fused_vq_assign_sharded runs it per-shard under shard_map with psum'd
    EMA partials); jnp/GSPMD fallback otherwise.  On hardware ~0.4% of
    assignments differ from the XLA path — exact numeric ties (max relative
    distance gap 5e-5) under different MXU accumulation order; bit-exact in
    interpret mode (tests/test_rotation_and_pallas_vq.py).  bench.py records
    the measured kernel-vs-XLA delta.
  * Decode step (decode_pallas.py): pallas fuses ALL transformer layers of a
    token step into one kernel — level-0 decode 56us -> 34us/step; enabled
    automatically when batch*heads % 128 == 0.
  * Training-path blockwise attention: XLA kept.  Measured with in-jit loops
    (dispatch excluded): 71-89 TFLOP/s f32 at the Jukebox-SMALL geometry
    (ctx 8192, d1024) — at or near the chip's f32 peak; at the small flagship
    widths (attn width 32, head dim 16) throughput is MXU-shape-bound, which
    a custom kernel cannot change.
"""

from vae_music_tpu.ops.vq_pallas import (
    fused_vq_assign,
    fused_vq_assign_sharded,
    vq_pallas_available,
)
from vae_music_tpu.ops.decode_pallas import decode_pallas_available, fused_decode_step
