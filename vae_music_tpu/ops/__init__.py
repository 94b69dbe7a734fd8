"""Custom TPU kernels (Pallas) + the benchmark-driven dispatch policy.

Per the build plan (SURVEY.md §7 stage 3): implement fused kernels for the
hot numeric paths, benchmark against the XLA baseline, keep whichever wins
per shape.  Measured on TPU v5e:

  * VQ codebook assignment+EMA (vq_pallas.py): XLA ~ties at flagship N
    (28k rows: 22us vs 27us) — pallas wins ~2x at 256k rows (24us vs 41us,
    the (N,K) distance matrix stays in VMEM).  Opt-in via
    quantize(use_pallas=True); XLA default (auto-partitions under GSPMD).
  * Decode step (decode_pallas.py): pallas fuses ALL transformer layers of a
    token step into one kernel — level-0 decode 56us -> 34us/step; enabled
    automatically when batch*heads % 128 == 0.
  * Training-path blockwise attention: XLA kept.  Measured with in-jit loops
    (dispatch excluded): 71-89 TFLOP/s f32 at the Jukebox-SMALL geometry
    (ctx 8192, d1024) — at or near the chip's f32 peak; at the small flagship
    widths (attn width 32, head dim 16) throughput is MXU-shape-bound, which
    a custom kernel cannot change.
"""

from vae_music_tpu.ops.vq_pallas import fused_vq_assign, vq_pallas_available
from vae_music_tpu.ops.decode_pallas import decode_pallas_available, fused_decode_step
