"""GPipe-style pipeline parallelism over transformer depth.

The reference has no distribution story at all (SURVEY.md §2.2); DP/TP/SP are
covered by mesh.py / sharding.py / ring_attention.py.  This module adds the
fourth mesh axis: PIPELINE parallelism.  The ``depth`` ResidualAttnBlocks of a
FactorizedTransformer (nn/transformer.py, mirroring
/root/reference/src/transformer/transformer.py:63-115) are split into
``n_stages`` consecutive groups, one per device along a ``'pipe'`` mesh axis:

  * per-layer params are stacked on a leading depth axis and sharded over
    'pipe' — each device holds only depth/n_stages layers' weights;
  * the batch is split into M microbatches; a ``lax.scan`` over
    ``M + n_stages - 1`` ticks runs the classic GPipe schedule, every stage
    busy once the pipe fills;
  * activations hop stage-to-stage with ``lax.ppermute`` — one neighbour ICI
    hop per tick, no all-to-all;
  * the attention-pattern schedule (row/col/prev_row cycling per GLOBAL layer
    index, transformer.py:82-86 semantics) is preserved with a ``lax.switch``
    on ``(stage*L + j) % cycle`` — the three pattern branches share identical
    parameter shapes, so stacked layers stay homogeneous.

The whole pipelined forward is one differentiable XLA program, so
``jax.grad`` through it gives pipeline-parallel *training* for free (the scan
over ticks doubles as microbatch accumulation).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 promotes shard_map out of experimental
    from jax import shard_map

    _REP_KWARG = "check_vma"
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

    _REP_KWARG = "check_rep"  # legacy name of the replication-check kwarg

from vae_music_tpu.nn.transformer import FactorizedTransformer, ResidualAttnBlock


def stack_layer_params(tf_params: dict, depth: int) -> Any:
    """Stack ``layer_0 .. layer_{depth-1}`` param subtrees onto a leading
    depth axis (all ResidualAttnBlocks have identical leaf shapes regardless
    of attention pattern, so the stack is homogeneous)."""
    layers = [tf_params[f"layer_{i}"] for i in range(depth)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked: Any, depth: int) -> dict:
    """Inverse of :func:`stack_layer_params` (e.g. for checkpoint interop)."""
    return {
        f"layer_{i}": jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
        for i in range(depth)
    }


def pipeline_transformer_apply(
    tf: FactorizedTransformer,
    stacked_params: Any,
    x: jnp.ndarray,  # (N, T, D) global batch
    *,
    mesh: Mesh,
    n_microbatches: int,
    axis_name: str = "pipe",
) -> jnp.ndarray:
    """Run ``tf``'s forward pass pipelined over ``mesh.shape[axis_name]``
    stages.  ``stacked_params`` is :func:`stack_layer_params` of the
    transformer's params; it is sharded over 'pipe' on its leading axis, so
    each device materialises only its own stage's weights."""
    n_stages = mesh.shape[axis_name]
    depth = tf.depth
    assert depth % n_stages == 0, f"depth {depth} % stages {n_stages} != 0"
    layers_per_stage = depth // n_stages
    n, t, d = x.shape
    m = n_microbatches
    assert n % m == 0, f"batch {n} % microbatches {m} != 0"

    cycle = 2 if tf.attn_stacks == 0 else 3
    block_defs = [
        ResidualAttnBlock(
            ctx_len=tf.ctx_len, num_heads=tf.num_heads, d_model=tf.d_model,
            blocks=tf.blocks, attn_func=f, m_attn=tf.m_attn, m_mlp=tf.m_mlp,
            dropout=tf.dropout, dtype=tf.dtype)
        for f in range(cycle)
    ]
    branch_fns = [
        (lambda p, h, blk=blk: blk.apply({"params": p}, h, train=False))
        for blk in block_defs
    ]

    def stage_body(p_st, xm):
        # p_st: this stage's (layers_per_stage, ...) params; xm: (M, mb, T, D)
        # replicated microbatched input.
        stage = jax.lax.axis_index(axis_name)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def apply_stage(h):
            def layer_step(hh, inp):
                p_layer, j = inp
                g = stage * layers_per_stage + j
                hh = jax.lax.switch(g % cycle, branch_fns, p_layer, hh)
                return hh, None
            h, _ = jax.lax.scan(layer_step, h,
                                (p_st, jnp.arange(layers_per_stage)))
            return h

        def tick(carry, step):
            state, out_acc = carry
            # stage 0 ingests microbatch `step` while the pipe is filling
            inject = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(step, 0, m - 1), 0, keepdims=False)
            h_in = jnp.where(stage == 0, inject, state)
            h_out = apply_stage(h_in)
            # the last stage drains microbatch `step - (n_stages - 1)`
            widx = step - (n_stages - 1)
            wc = jnp.clip(widx, 0, m - 1)
            valid = jnp.logical_and(stage == n_stages - 1, widx >= 0)
            cur = jax.lax.dynamic_index_in_dim(out_acc, wc, 0, keepdims=False)
            out_acc = jax.lax.dynamic_update_index_in_dim(
                out_acc, jnp.where(valid, h_out, cur), wc, 0)
            state = jax.lax.ppermute(h_out, axis_name, perm)
            return (state, out_acc), None

        carry = (jnp.zeros_like(xm[0]), jnp.zeros_like(xm))
        (_, out_acc), _ = jax.lax.scan(tick, carry,
                                       jnp.arange(m + n_stages - 1))
        # outputs live on the last stage only; masked psum replicates them
        out_acc = jax.lax.psum(
            jnp.where(stage == n_stages - 1, out_acc,
                      jnp.zeros_like(out_acc)), axis_name)
        return out_acc

    # Replication check off: the output is replicated by construction
    # (masked psum over the full axis), which the tracker can't prove.
    fn = shard_map(stage_body, mesh=mesh,
                   in_specs=(P(axis_name), P()), out_specs=P(),
                   **{_REP_KWARG: False})
    xm = x.reshape(m, n // m, t, d)
    return fn(stacked_params, xm).reshape(n, t, d)
