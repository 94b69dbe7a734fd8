"""Custom TPU kernels (Pallas) + the benchmark-driven dispatch policy.

Per the build plan (SURVEY.md §7 stage 3): implement fused kernels for the
hot numeric paths, benchmark against the XLA baseline, keep whichever wins
per shape.  Measured on TPU v5e:

  * VQ codebook assignment+EMA (vq_pallas.py): at the flagship encode shape
    (28672 rows, D=64 K=512) the kernel does NOT beat XLA — on-device
    fori_loop timing (scripts/vq_kernel_lab.py, r3) puts XLA's fused path at
    ~588-618us and every kernel variant tried (quant-matmul removal, folded
    count row, staged/packed argmin, bf16 scores) at ~585-740us; the shared
    floor is the VPU argmin over the (N, K) distance matrix, which XLA fuses
    equally well.  quantize(use_pallas=None) therefore routes single-chip
    programs through the jnp path (the measured winner, and numerically
    identical across releases) and uses the kernel only under shard_map
    (fused_vq_assign_sharded — per-shard kernel, psum'd EMA partials), where
    it prevents GSPMD replicating the assignment.  On hardware ~0.4% of
    kernel assignments differ from the XLA path — exact numeric ties under
    different MXU accumulation order; bit-exact in interpret mode
    (tests/test_rotation_and_pallas_vq.py).  bench.py records the measured
    per-path delta and which path production dispatch uses.
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
    fused_vq_encode,
    vq_pallas_available,
)
from vae_music_tpu.ops.decode_pallas import decode_pallas_available, fused_decode_step
