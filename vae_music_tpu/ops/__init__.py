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
  * Training-path blockwise attention: XLA kept.  At flagship shapes
    (ctx 896, d128, batch 8) a fwd+grad round is ~2-4 ms and dispatch-bound;
    the pattern reshapes already tile cleanly onto the MXU and a custom
    kernel cannot beat the dispatch floor.
"""

from vae_music_tpu.ops.vq_pallas import fused_vq_assign, vq_pallas_available
from vae_music_tpu.ops.decode_pallas import decode_pallas_available, fused_decode_step
