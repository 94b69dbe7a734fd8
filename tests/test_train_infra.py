"""Checkpoint/resume, monitors, training loops, vanilla prior, random search."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vae_music_tpu.configs import VQVAEConfig, PriorConfig
from vae_music_tpu.data.audio import synthetic_audio_batch
from vae_music_tpu.models.autoregressive import MHAAutoregressive, make_dense_decode_fn
from vae_music_tpu.models.vqvae import init_vqvae
from vae_music_tpu.sample.decode import SampleMode
from vae_music_tpu.sample.search import make_score_fn, random_sample, token_mode_fraction
from vae_music_tpu.train.checkpoint import CheckpointManager
from vae_music_tpu.train.loop import make_inspect_fn, train_prior, train_vqvae
from vae_music_tpu.train.metrics import MeanAggregator, codebook_usage_report, write_wav
from vae_music_tpu.train.monitors import VQVAEMonitor
from vae_music_tpu.train.state import VQVAETrainState
from vae_music_tpu.train.vqvae_step import make_vqvae_eval_step, make_vqvae_train_step


def _tiny_cfg():
    return VQVAEConfig(
        sample_length=1024, levels=1, latent_dim=8, codebook_size=16,
        down_depth=(3,), strides=(2,), residual_width=8, residual_depth=2,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()


def test_checkpoint_roundtrip_restores_everything(tmp_path):
    cfg = _tiny_cfg()
    params, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    state = VQVAETrainState.create(params, cbs, optax.adam(1e-3))
    step = make_vqvae_train_step(cfg, donate=False)
    x = jnp.asarray(synthetic_audio_batch(0, 4, cfg.sample_length)[0])
    for _ in range(3):
        state, _ = step(state, x, jax.random.PRNGKey(1))

    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(int(state.step), state)

    fresh_params, fresh_cbs = init_vqvae(jax.random.PRNGKey(9), cfg)
    template = VQVAETrainState.create(fresh_params, fresh_cbs, optax.adam(1e-3))
    restored = mngr.restore(template)

    assert int(restored.step) == 3  # the step resumes (gap noted at monitors.py:38-40)
    np.testing.assert_allclose(np.asarray(restored.codebooks[0].N_t),
                               np.asarray(state.codebooks[0].N_t))
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # Training continues identically from the restored state.
    s1, m1 = step(state, x, jax.random.PRNGKey(2))
    s2, m2 = step(restored, x, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    mngr.close()


def test_train_loop_with_monitor(tmp_path):
    cfg = _tiny_cfg()
    x, _ = synthetic_audio_batch(0, 16, cfg.sample_length)
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    monitor = VQVAEMonitor(
        str(tmp_path), ckpt_manager=mngr,
        eval_fn=make_vqvae_eval_step(cfg), val_batch=jnp.asarray(x[:4]),
        inspect_fn=make_inspect_fn(cfg), inspect_batch=jnp.asarray(x[:2]),
        ckpt_interval=1, val_interval=1, inspect_interval=1)
    state = train_vqvae(cfg, x, epochs=2, batch_size=4, monitor=monitor)
    assert int(state.step) == 8
    assert mngr.latest_step() is not None
    assert os.path.exists(tmp_path / "vqvae_train.jsonl")
    assert os.path.exists(tmp_path / "vqvae_val.jsonl")
    assert os.path.exists(tmp_path / "recons" / "epoch1_level0.wav")
    mngr.close()


@pytest.mark.slow
def test_train_prior_loop():
    cfg = _tiny_cfg()
    pcfg = PriorConfig(level=0, levels=1, bins=17, width=32, depth=2, heads=2,
                       blocks=4, attn_stacks=1, dropout=0.0, genre_classes=10)
    vp, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    x, y = synthetic_audio_batch(0, 8, cfg.sample_length)
    state = train_prior(cfg, pcfg, vp, cbs, x, y, epochs=1, batch_size=4)
    assert int(state.step) == 2


def test_write_wav_roundtrip(tmp_path):
    import wave

    path = str(tmp_path / "t.wav")
    sig = np.sin(np.linspace(0, 40, 3000)).astype(np.float32)
    write_wav(path, sig, 3000)
    with wave.open(path) as f:
        assert f.getframerate() == 3000
        assert f.getnframes() == 3000


def test_mean_aggregator():
    agg = MeanAggregator()
    agg.update({"a": 1.0})
    agg.update({"a": 3.0})
    assert agg.result() == {"a": 2.0}
    agg.reset()
    assert agg.result() == {}


def test_codebook_usage_report():
    rep = codebook_usage_report(np.array([0.0, 2.0, 5.0, 0.5]))
    assert rep["codes_in_use"] == 2
    assert rep["codes_total"] == 4


# -- vanilla dense-attention prior (autoregressive.py) -----------------------


def test_vanilla_prior_forward_and_cached_decode():
    model = MHAAutoregressive(bins=17, width=32, depth=2, ctx_len=12,
                              ffn_width=64, heads=2, dropout=0.0)
    tokens = jnp.zeros((2, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    logits, attn = model.apply(params, tokens)
    assert logits.shape == (2, 12, 17)
    assert set(attn) == {"decoder_layer1_attention", "decoder_layer2_attention"}

    dec = make_dense_decode_fn(model, 2, mode=SampleMode.GREEDY, return_logits=True)
    out_tokens, dec_logits = dec(params, jax.random.PRNGKey(1))
    assert out_tokens.shape == (2, 13)
    full_logits, _ = model.apply(params, out_tokens[:, :-1])
    np.testing.assert_allclose(np.asarray(dec_logits), np.asarray(full_logits),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(full_logits, -1)),
                                  np.asarray(out_tokens[:, 1:]))


# -- best-of-N random search (autoregressive_fmha.py:242-302) ----------------


def test_token_mode_fraction():
    t = jnp.array([[1, 1, 1, 2], [1, 2, 3, 4]])
    np.testing.assert_allclose(np.asarray(token_mode_fraction(t, 5)), [0.75, 0.25])


def test_random_sample_prefers_low_loss_and_rejects_degenerate():
    model = MHAAutoregressive(bins=17, width=32, depth=2, ctx_len=12,
                              ffn_width=64, heads=2, dropout=0.0)
    tokens = jnp.zeros((2, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    dec = make_dense_decode_fn(model, 4, mode=SampleMode.GUMBEL)
    score = make_score_fn(model)
    best, best_loss = random_sample(dec, score, params, jax.random.PRNGKey(1),
                                    bins=17, iterations=3, token_freq=0.9)
    assert best.shape == (13,)
    assert np.isfinite(float(best_loss))
    frac = float(token_mode_fraction(best[None, 1:], 17)[0])
    assert frac < 0.9


def test_random_sample_all_degenerate_returns_inf_loss():
    """When every candidate fails the degeneracy gate the fallback tokens
    come back with loss == inf so callers can DETECT the failure (ADVICE r2:
    the raw pre-rejection loss looked like a successful search)."""
    model = MHAAutoregressive(bins=17, width=32, depth=2, ctx_len=12,
                              ffn_width=64, heads=2, dropout=0.0)
    tokens = jnp.zeros((2, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    dec = make_dense_decode_fn(model, 4, mode=SampleMode.GUMBEL)
    score = make_score_fn(model)
    # token_freq=0.0 -> every candidate is "degenerate" by construction
    best, best_loss = random_sample(dec, score, params, jax.random.PRNGKey(1),
                                    bins=17, iterations=2, token_freq=0.0)
    assert best.shape == (13,)
    assert np.isinf(float(best_loss))


def test_histogram_logging(tmp_path):
    """PriorMonitor(log_histograms=True) writes per-leaf weight AND gradient
    histograms (reference prior.py:306-316)."""
    import json

    from vae_music_tpu.train.monitors import PriorMonitor
    from vae_music_tpu.train.prior_step import (
        default_prior_optimizer,
        init_prior,
        make_prior_grad_fn,
    )
    from vae_music_tpu.train.state import PriorTrainState

    vcfg = _tiny_cfg()
    pcfg = PriorConfig(level=0, levels=1, bins=17, width=32, depth=2, heads=2,
                       blocks=4, attn_stacks=1, dropout=0.0, genre_classes=10)
    vq_params, cbs = init_vqvae(jax.random.PRNGKey(0), vcfg)
    _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)
    state = PriorTrainState.create(params, default_prior_optimizer(pcfg))

    audio = jnp.asarray(synthetic_audio_batch(0, 2, vcfg.sample_length)[0])
    labels = jnp.zeros((2,), jnp.int32)
    grad_fn = make_prior_grad_fn(vcfg, pcfg, vq_params, cbs)

    mon = PriorMonitor(str(tmp_path), log_histograms=True, hist_interval=1,
                       grad_fn=grad_fn, val_batch=(audio, labels))
    mon.on_epoch_end(1, state)

    param_npz = tmp_path / "histograms" / "step00000000_param.npz"
    grad_npz = tmp_path / "histograms" / "step00000000_grad.npz"
    assert param_npz.exists() and grad_npz.exists()

    leaf_sizes = {
        "param/" + "/".join(str(getattr(p, "key", p)) for p in path):
            int(np.size(leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    data = np.load(str(param_npz))
    counts = [k for k in data.files if k.endswith("__counts")]
    assert len(counts) == len(leaf_sizes)
    for k in counts:
        name = k[: -len("__counts")]
        # histogram counts cover every element of the leaf
        assert int(data[k].sum()) == leaf_sizes[name]
        assert f"{name}__edges" in data.files

    gdata = np.load(str(grad_npz))
    assert len([k for k in gdata.files if k.endswith("__counts")]) == len(leaf_sizes)

    # JSONL index carries summary moments for both trees
    lines = [json.loads(l) for l in
             open(tmp_path / "histograms" / "index.jsonl")]
    names = [n for rec in lines for n in rec if n not in ("step", "time")]
    assert any(n.startswith("param/") for n in names)
    assert any(n.startswith("grad/") for n in names)


@pytest.mark.slow
def test_random_sample_condition_aware():
    """Conditioned best-of-N (same y_cond threaded through decode AND score,
    autoregressive_fmha.py:242-302) beats the unconditioned search on a toy
    prior trained to emit label-specific token patterns."""
    from vae_music_tpu.models.prior import FMHAPrior, shift_right_with_start
    from vae_music_tpu.sample.decode import make_decode_fn
    from vae_music_tpu.train.prior_step import init_prior

    vcfg = VQVAEConfig(
        sample_length=256, levels=1, latent_dim=8, codebook_size=16,
        down_depth=(3,), strides=(2,), residual_width=8, residual_depth=1,
        dilation_factor=3, use_spectral_loss=False,
    ).validate()
    pcfg = PriorConfig(level=0, levels=1, bins=17, width=32, depth=2, heads=2,
                       blocks=4, attn_stacks=1, dropout=0.0, genre_classes=2)
    ctx = vcfg.z_lengths[0]
    model, params = init_prior(jax.random.PRNGKey(0), vcfg, pcfg)

    # Label-specific targets: y=0 -> 3,4,3,4,...  y=1 -> 7,8,7,8,...
    pat = {0: jnp.tile(jnp.array([3, 4], jnp.int32), ctx // 2),
           1: jnp.tile(jnp.array([7, 8], jnp.int32), ctx // 2)}
    targets = jnp.stack([pat[0], pat[1]])                  # (2, ctx)
    tokens = shift_right_with_start(targets, pcfg.bins - 1)
    y = jnp.array([0, 1], jnp.int32)

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            y_cond = model.apply(p, y, method=FMHAPrior.embed_labels)
            logits, _ = model.apply(p, tokens, None, y_cond)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(150):
        params, opt_state, loss = train_step(params, opt_state)
    assert float(loss) < 0.05

    dec = make_decode_fn(pcfg, ctx, 4)
    y0_cond = model.apply(params, jnp.zeros((4,), jnp.int32),
                          method=FMHAPrior.embed_labels)

    best_c, loss_c = random_sample(
        dec, make_score_fn(model, y_cond=y0_cond), params,
        jax.random.PRNGKey(1), bins=pcfg.bins, iterations=3, token_freq=0.6,
        decode_args=(None, y0_cond))
    best_u, loss_u = random_sample(
        dec, make_score_fn(model), params,
        jax.random.PRNGKey(1), bins=pcfg.bins, iterations=3, token_freq=0.6)

    # Conditioned search reproduces the y=0 pattern and scores better.
    frac_pattern = float(jnp.mean(jnp.isin(best_c[1:], jnp.array([3, 4]))))
    assert frac_pattern > 0.9
    assert float(loss_c) < float(loss_u)


@pytest.mark.slow
def test_grad_accumulation_prior():
    """accum_steps=k: params frozen for k-1 microsteps, then one update equal
    to a plain step on the same (repeated) batch — optax.MultiSteps averages
    the k identical grads back to the single-step update."""
    from vae_music_tpu.train.prior_step import (
        default_prior_optimizer,
        init_prior,
        make_prior_train_step,
    )
    from vae_music_tpu.train.state import PriorTrainState

    cfg = _tiny_cfg()
    pcfg = PriorConfig(level=0, levels=1, bins=17, width=32, depth=2, heads=2,
                       blocks=4, attn_stacks=1, dropout=0.0, genre_classes=10,
                       teacher_force_rate=0.0)  # deterministic forward
    vp, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    x, y = synthetic_audio_batch(0, 4, cfg.sample_length)
    x, y = jnp.asarray(x), jnp.asarray(y)
    _, params = init_prior(jax.random.PRNGKey(1), cfg, pcfg)
    step = make_prior_train_step(cfg, pcfg, vp, cbs, donate=False)

    acc = PriorTrainState.create(params, default_prior_optimizer(pcfg, accum_steps=2))
    acc1, _ = step(acc, x, y, jax.random.PRNGKey(2))
    # microstep 1: no parameter motion yet
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        acc1.params, params)
    acc2, _ = step(acc1, x, y, jax.random.PRNGKey(2))

    plain = PriorTrainState.create(params, default_prior_optimizer(pcfg))
    plain1, _ = step(plain, x, y, jax.random.PRNGKey(2))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        acc2.params, plain1.params)


def test_restore_params_across_optimizers(tmp_path):
    """Checkpoints trained with a wrapped optimizer (--accum_steps ->
    optax.MultiSteps) must still load in serving paths: restore_params reads
    params/codebooks template-free, so opt_state structure changes can't
    break generation."""
    from vae_music_tpu.train.optim import with_grad_accumulation

    cfg = _tiny_cfg()
    vp, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    tx = with_grad_accumulation(optax.adam(1e-3), 2)
    state = VQVAETrainState.create(vp, cbs, tx)
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(0, state)
    restored = mngr.restore_params()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored["params"], vp)
    assert len(restored["codebooks"]) == cfg.levels
    np.testing.assert_array_equal(np.asarray(restored["codebooks"][0].embeddings),
                                  np.asarray(cbs[0].embeddings))
    mngr.close()


def test_param_ema_tracks_training():
    """EMA shadow params converge toward (but lag) the live trajectory and
    stay a valid forward-pass parameter set."""
    from vae_music_tpu.train import init_param_ema, update_param_ema
    from vae_music_tpu.train.vqvae_step import make_vqvae_train_step

    cfg = _tiny_cfg()
    vp, cbs = init_vqvae(jax.random.PRNGKey(0), cfg)
    x, _ = synthetic_audio_batch(0, 4, cfg.sample_length)
    state = VQVAETrainState.create(vp, cbs, optax.adam(1e-2))
    step = make_vqvae_train_step(cfg, donate=False)
    ema = init_param_ema(state.params)
    for i in range(3):
        state, _ = step(state, jnp.asarray(x), jax.random.PRNGKey(i))
        ema = update_param_ema(ema, state.params, 0.5)

    def dist(a, b):
        return sum(float(jnp.sum(jnp.abs(x - y)))
                   for x, y in zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b)))

    assert dist(ema, vp) > 0.0            # moved off the init
    assert dist(ema, state.params) > 0.0  # but lags the live params
    assert dist(ema, state.params) < dist(vp, state.params)  # ...toward them
    # EMA weights are drop-in params for the forward pass
    from vae_music_tpu.models.vqvae import vqvae_apply
    _, total, _, _ = vqvae_apply(ema, state.codebooks, cfg, jnp.asarray(x),
                                 train=False)
    assert np.isfinite(float(total))
