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
    batch_axis: str | None = None,
) -> jnp.ndarray:
    """Run ``tf``'s forward pass pipelined over ``mesh.shape[axis_name]``
    stages.  ``stacked_params`` is :func:`stack_layer_params` of the
    transformer's params; it is sharded over 'pipe' on its leading axis, so
    each device materialises only its own stage's weights.  With
    ``batch_axis``, the within-microbatch batch dimension additionally
    shards over that axis (DPxPP)."""
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
                   in_specs=(P(axis_name), P(None, batch_axis)),
                   out_specs=P(None, batch_axis),
                   **{_REP_KWARG: False})
    xm = x.reshape(m, n // m, t, d)
    return fn(stacked_params, xm).reshape(n, t, d)


# ---------------------------------------------------------------------------
# Full-prior pipeline (VERDICT r2 #4): stage 0 owns embedding + conditioner
# add, the last stage owns the logits head, composing into a trainable step.
# ---------------------------------------------------------------------------


def split_prior_params(params: dict, depth: int) -> dict:
    """{'params': tree} -> {'stacked': (depth, ...) layer stack, 'rest': the
    non-transformer leaves}.  ``stacked`` is what gets sharded over 'pipe';
    ``rest`` (embedding/pos/head/conditioners) stays replicated."""
    p = dict(params["params"])
    tf_params = p.pop("transformer")
    return {"stacked": stack_layer_params(tf_params, depth), "rest": p}


def merge_prior_params(split: dict, depth: int) -> dict:
    """Inverse of :func:`split_prior_params` (for model.apply / checkpoints)."""
    p = dict(split["rest"])
    p["transformer"] = unstack_layer_params(split["stacked"], depth)
    return {"params": p}


def pp_state_sharding(mesh: Mesh, state: Any, axis_name: str = "pipe") -> Any:
    """NamedSharding pytree for a PP train state (split params).

    Every leaf living under a ``'stacked'`` key — the (depth, ...) transformer
    layer stack from :func:`split_prior_params`, and the optimizer moments
    that mirror it — is sharded over ``axis_name`` on its leading depth axis,
    so each stage's device holds (and checkpoints/restores) only its own
    layers' weights and slots.  Everything else (embedding/head/conditioner
    leaves, step counters) stays replicated.  Pass the result to
    ``CheckpointManager.restore(..., shardings=...)`` to restore a PP
    checkpoint directly to its pipeline placement.
    """
    from jax.sharding import NamedSharding

    pipe = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    n_stages = mesh.shape[axis_name]

    def _key_name(k):
        # DictKey(key=...), GetAttrKey(name=...), SequenceKey(idx=...)
        return getattr(k, "key", getattr(k, "name", None))

    def spec(path, leaf):
        # Exact key match (advisor r4): substring matching on str(k) would
        # pipe-shard any future leaf whose key merely CONTAINS 'stacked'.
        in_stack = any(_key_name(k) == "stacked" for k in path)
        shape = getattr(leaf, "shape", ())
        if in_stack and len(shape) >= 1:
            if shape[0] % n_stages != 0:
                # A stacked layer leaf that cannot split evenly is a config
                # error — silently replicating it would desync the per-stage
                # weights from the pipelined apply's stage slicing.
                raise ValueError(
                    f"stacked leaf at {jax.tree_util.keystr(path)} has "
                    f"leading dim {shape[0]} not divisible by "
                    f"{n_stages} pipeline stages")
            return pipe
        return repl

    return jax.tree_util.tree_map_with_path(spec, state)


def pp_shard_state(mesh: Mesh, state: Any, axis_name: str = "pipe"):
    """Device-put a split-params train state under PP placements;
    returns (state, shardings) — the twin of ``fsdp.shard_state``."""
    shardings = pp_state_sharding(mesh, state, axis_name)
    placed = jax.tree_util.tree_map(jax.device_put, state, shardings)
    return placed, shardings


def pipeline_prior_apply(
    prior_cfg,
    ctx_len: int,
    split_params: dict,      # split_prior_params(...) output
    tokens: jnp.ndarray,     # (N, T) int32 (shifted-right inputs)
    cond_stream=None,        # (N, T, width) pre-upsampled conditioning
    y_cond=None,             # (N, 1, width) label embedding (position 0 swap)
    *,
    mesh: Mesh,
    n_microbatches: int,
    axis_name: str = "pipe",
    batch_axis: str | None = None,
    dropout_rng=None,
) -> jnp.ndarray:
    """The COMPLETE FMHAPrior forward (models/prior.py:99-118) pipelined over
    ``mesh.shape[axis_name]`` stages: stage 0 embeds the injected microbatch
    (token embedding x sqrt(d) + y_cond swap + positional + conditioning
    add), every stage runs its layer shard, and the LAST stage applies the
    logits head to each microbatch it drains.  Returns (N, T, bins) logits
    (replicated over 'pipe').

    ``batch_axis='data'`` additionally shards the within-microbatch batch
    dimension over that mesh axis (DPxPP on a 2-D mesh): each data slice runs
    its own pipeline; 'pipe' collectives stay within the slice and gradients
    psum over 'data' via the shard_map transpose.  ``dropout_rng`` enables
    train-mode dropout at ``prior_cfg.dropout``, the mask stream folded with
    (global layer, microbatch[, data-shard]) so every (stage, microbatch)
    draws an independent mask."""
    import flax.linen as nn

    from vae_music_tpu.nn.positional import sinusoidal_encoding

    c = prior_cfg
    n_stages = mesh.shape[axis_name]
    depth = c.depth
    assert depth % n_stages == 0
    layers_per_stage = depth // n_stages
    n, t = tokens.shape
    assert t == ctx_len
    m = n_microbatches
    assert n % m == 0
    mb = n // m
    cycle = 2 if c.attn_stacks == 0 else 3
    use_dropout = dropout_rng is not None and c.dropout > 0.0
    block_defs = [
        ResidualAttnBlock(
            ctx_len=ctx_len, num_heads=c.heads, d_model=c.width,
            blocks=c.blocks, attn_func=f, m_attn=c.m_attn, m_mlp=c.m_mlp,
            dropout=c.dropout if use_dropout else 0.0)
        for f in range(cycle)
    ]
    if use_dropout:
        branch_fns = [
            (lambda p, h, key, blk=blk: blk.apply(
                {"params": p}, h, train=True, rngs={"dropout": key}))
            for blk in block_defs
        ]
    else:
        branch_fns = [
            (lambda p, h, key, blk=blk: blk.apply({"params": p}, h,
                                                  train=False))
            for blk in block_defs
        ]
    sqrt_d = jnp.sqrt(jnp.float32(c.width))
    has_cond = cond_stream is not None
    has_y = y_cond is not None

    def stage_body(stacked, rest, tok_m, *extra):
        extra = list(extra)
        cond_m = extra.pop(0) if has_cond else None   # (M, mb, T, width)
        yc_m = extra.pop(0) if has_y else None        # (M, mb, 1, width)
        rng = extra.pop(0) if use_dropout else None
        stage = jax.lax.axis_index(axis_name)
        if use_dropout and batch_axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(batch_axis))
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        mb_loc = tok_m.shape[1]   # local microbatch rows (mb / |batch_axis|)

        def embed_mb(step):
            """Stage 0's ingest: the prior's input block (prior.py:109-115)."""
            tk = jax.lax.dynamic_index_in_dim(tok_m, step, 0, keepdims=False)
            x = nn.Embed(c.bins, c.width).apply(
                {"params": rest["x_embedding"]}, tk)
            if yc_m is not None:
                yc = jax.lax.dynamic_index_in_dim(yc_m, step, 0,
                                                  keepdims=False)
                x = jnp.concatenate([yc.astype(x.dtype), x[:, 1:]], axis=1)
            x = x * sqrt_d
            if c.pos_emb:
                x = x + rest["x_pos_embedding"]["embeddings"][:ctx_len]
            else:
                x = x + sinusoidal_encoding(ctx_len, c.width)[0]
            if cond_m is not None:
                x = x + jax.lax.dynamic_index_in_dim(
                    cond_m, step, 0, keepdims=False).astype(x.dtype)
            return x

        def apply_stage(h, tick_step):
            # The microbatch this stage is processing at this tick (garbage
            # during pipe fill/drain — those outputs are masked anyway).
            mb_id = jnp.clip(tick_step - stage, 0, m - 1)

            def layer_step(hh, inp):
                p_layer, j = inp
                g = stage * layers_per_stage + j
                key = (jax.random.fold_in(jax.random.fold_in(rng, g), mb_id)
                       if use_dropout else jnp.zeros((2,), jnp.uint32))
                hh = jax.lax.switch(g % cycle, branch_fns, p_layer, hh, key)
                return hh, None
            h, _ = jax.lax.scan(layer_step, h,
                                (stacked, jnp.arange(layers_per_stage)))
            return h

        def head(h):
            """Last stage's drain: the logits head (prior.py:118)."""
            return nn.Dense(c.bins).apply({"params": rest["out"]}, h)

        def tick(carry, step):
            state, out_acc = carry
            inject = embed_mb(jnp.clip(step, 0, m - 1))
            h_in = jnp.where(stage == 0, inject, state)
            h_out = apply_stage(h_in, step)
            widx = step - (n_stages - 1)
            wc = jnp.clip(widx, 0, m - 1)
            valid = jnp.logical_and(stage == n_stages - 1, widx >= 0)
            logits_mb = head(h_out)
            cur = jax.lax.dynamic_index_in_dim(out_acc, wc, 0, keepdims=False)
            out_acc = jax.lax.dynamic_update_index_in_dim(
                out_acc, jnp.where(valid, logits_mb, cur), wc, 0)
            state = jax.lax.ppermute(h_out, axis_name, perm)
            return (state, out_acc), None

        carry = (jnp.zeros((mb_loc, t, c.width), jnp.float32),
                 jnp.zeros((m, mb_loc, t, c.bins), jnp.float32))
        (_, out_acc), _ = jax.lax.scan(tick, carry,
                                       jnp.arange(m + n_stages - 1))
        out_acc = jax.lax.psum(
            jnp.where(stage == n_stages - 1, out_acc,
                      jnp.zeros_like(out_acc)), axis_name)
        return out_acc

    mb_spec = P(None, batch_axis)
    specs = [P(axis_name), P(), mb_spec]
    args = [split_params["stacked"], split_params["rest"],
            tokens.reshape(m, mb, t)]
    if has_cond:
        specs.append(mb_spec)
        args.append(cond_stream.reshape(m, mb, t, -1))
    if has_y:
        specs.append(mb_spec)
        args.append(y_cond.reshape(m, mb, 1, -1))
    if use_dropout:
        specs.append(P())
        args.append(dropout_rng)
    fn = shard_map(stage_body, mesh=mesh, in_specs=tuple(specs),
                   out_specs=mb_spec, **{_REP_KWARG: False})
    return fn(*args).reshape(n, t, c.bins)


def make_prior_train_step_pp(
    vqvae_cfg,
    prior_cfg,
    vqvae_params,
    codebooks,
    *,
    mesh: Mesh,
    n_microbatches: int,
    axis_name: str = "pipe",
    batch_axis: str | None = None,
    donate: bool = True,
):
    """Pipeline-parallel twin of train.prior_step.make_prior_train_step.

    The train state's params are SPLIT (:func:`split_prior_params`): the
    transformer layer stack is sharded over 'pipe' (each stage holds — and
    its optimizer state tracks — only its own layers' weights), the
    embedding/head/conditioner leaves are replicated.  Same semantics as the
    single-device step (frozen encode, scheduled-sampling mix);
    tests/test_pipeline_parallel.py pins loss + updated params against it at
    dropout=0.  ``batch_axis='data'`` composes DPxPP on a 2-D mesh;
    ``prior_cfg.dropout > 0`` trains with per-(stage,microbatch) folded
    dropout streams (see :func:`pipeline_prior_apply`).
    """
    import optax

    from vae_music_tpu.models.prior import (
        FMHAPrior,
        build_fmha_prior,
        level_spec,
        shift_right_with_start,
        token_accuracy,
        token_loss,
    )
    from vae_music_tpu.models.vqvae import vqvae_encode

    model = build_fmha_prior(vqvae_cfg, prior_cfg)
    level = prior_cfg.level
    levels = vqvae_cfg.levels
    conditioned = prior_cfg.conditioner is not None
    start_token = prior_cfg.bins - 1
    tf_rate = prior_cfg.teacher_force_rate
    depth = prior_cfg.depth
    ctx_len = level_spec(vqvae_cfg, level).ctx_len

    use_dropout = prior_cfg.dropout > 0.0

    def train_step(state, audio, labels, rng):
        """``state.params`` is a split tree ({'stacked','rest'})."""
        step_rng = jax.random.fold_in(rng, state.step)
        tf_rng, drop1, drop2 = jax.random.split(step_rng, 3)

        zs = vqvae_encode(vqvae_params, codebooks, vqvae_cfg, audio, level,
                          levels)
        codes = zs[0]
        target = codes
        latent_input = shift_right_with_start(codes, start_token)

        def forward(split, tok, drop_rng):
            # label/conditioner nets live in 'rest' — applying via the rest
            # subtree alone avoids gathering the pipe-sharded layer stack.
            rest_vars = {"params": split["rest"]}
            yc = (model.apply(rest_vars, labels,
                              method=FMHAPrior.embed_labels)
                  if labels is not None else None)
            cs = (model.apply(rest_vars, zs[1],
                              method=FMHAPrior.upsample_cond)
                  if conditioned else None)
            return pipeline_prior_apply(
                prior_cfg, ctx_len, split, tok, cs, yc, mesh=mesh,
                n_microbatches=n_microbatches, axis_name=axis_name,
                batch_axis=batch_axis,
                dropout_rng=drop_rng if use_dropout else None)

        def loss_fn(split):
            logits1 = forward(split, latent_input, drop1)
            pred = jnp.argmax(logits1, axis=-1)
            pred_input = shift_right_with_start(pred, start_token)
            mix = jnp.where(
                jax.random.uniform(tf_rng, pred_input.shape) < tf_rate,
                pred_input, latent_input)
            logits = forward(split, jax.lax.stop_gradient(mix), drop2)
            return token_loss(target, logits), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "perplexity": jnp.exp(loss),
            "accuracy": token_accuracy(target, logits),
        }
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
