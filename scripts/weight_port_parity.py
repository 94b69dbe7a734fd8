"""Weight-port parity: same weights -> same logits -> same token distribution.

Closes the strongest "is it really the same model?" question (BASELINE.json
north star: "sampled-token distributions"): builds the reference's OWN models
(TF/CPU, unmodified code imported from /root/reference), ports every weight
into vae_music_tpu's modules via a deterministic layout mapping, then
asserts:

  1. FMHA prior (top level, y_cond) teacher-forced logits match <= 1e-4
     (/root/reference/src/autoregressive/autoregressive_fmha.py:109-160).
  2. Upsampler (x_cond through ConditionerNet) logits match <= 1e-4
     (conditioners.py:9-91 + autoregressive_fmha.py:141-151).
  3. The reference's own Gumbel sampling loop
     (tfp.RelaxedOneHotCategorical(1).sample() -> argmax,
     autoregressive_fmha.py:217-221; tfp shimmed with the literal
     Gumbel-softmax formula) and our KV-cached lax.scan decode produce the
     same token distribution under the SAME ported weights: per-position
     total-variation distance within the two-sample sampling-noise bound.
  4. VQ-VAE: ported encoder + codebook produce IDENTICAL integer codes, and
     the ported decoder reconstructs to <= 1e-5 (vqvae.py:208-260).

Weight layout mapping (verified bit-exact layer by layer):
  Conv1D (same/causal/dilated/strided)  kernel (k,in,out)  -> unchanged
  Conv1DTranspose kernel (k,out,in)     -> kernel[::-1].transpose(0,2,1)
  Dense kernel (in,out)                 -> unchanged
  keras MHA _query/_key/_value_dense    (in,h,hd) -> DenseGeneral q/k/v_proj
  keras MHA _output_dense               (h,hd,out) -> DenseGeneral o_proj
  Embedding / LayerNormalization        -> embedding / {scale, bias}

Run: python scripts/weight_port_parity.py   (CPU, ~2 min; writes PARITY §3
numbers to stdout for PARITY.md)
"""

import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ["CUDA_VISIBLE_DEVICES"] = ""

import numpy as np
import tensorflow as tf

# --- import stubs so the reference imports cleanly (see parity_check.py) ---
sys.modules["tensorflow_addons"] = types.ModuleType("tensorflow_addons")
librosa = types.ModuleType("librosa")
librosa.display = types.ModuleType("librosa.display")
sys.modules["librosa"] = librosa
sys.modules["librosa.display"] = librosa.display

# tfp shim: a REAL RelaxedOneHotCategorical sample (the Gumbel-softmax
# formula the reference relies on), so its sample() loop runs genuinely.
tfp = types.ModuleType("tensorflow_probability")
tfp.distributions = types.ModuleType("tensorflow_probability.distributions")


class _RelaxedOneHotCategorical:
    def __init__(self, temperature, logits):
        self.t = float(temperature)
        self.logits = logits

    def sample(self):
        u = tf.random.uniform(tf.shape(self.logits), minval=1e-20, maxval=1.0)
        gumbel = -tf.math.log(-tf.math.log(u))
        return tf.nn.softmax((self.logits + gumbel) / self.t, axis=-1)


tfp.distributions.RelaxedOneHotCategorical = _RelaxedOneHotCategorical
sys.modules["tensorflow_probability"] = tfp
sys.path.insert(0, REFERENCE)
sys.path.insert(0, REPO)

from src.autoregressive.autoregressive_fmha import FMHABasedAutoregressiveModel  # noqa: E402
from src.conditioner.label_conditioners import LabelConditioner as RefLabelConditioner  # noqa: E402
from encdec import Encoder as RefEncoder, Decoder as RefDecoder  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from vae_music_tpu.configs import ConditionerConfig, PriorConfig, VQVAEConfig  # noqa: E402
from vae_music_tpu.models.prior import FMHAPrior  # noqa: E402
from vae_music_tpu.models.vqvae import VQVAE, init_vqvae, vqvae_decode, vqvae_encode  # noqa: E402
from vae_music_tpu.nn.quantizer import CodebookState, quantize  # noqa: E402
from vae_music_tpu.sample.decode import make_decode_fn  # noqa: E402
from vae_music_tpu.train.prior_step import init_prior  # noqa: E402

# ---------------------------------------------------------------------------
# layout converters
# ---------------------------------------------------------------------------


def _np(v):
    return np.asarray(v)


def conv(l):
    return {"kernel": _np(l.kernel), "bias": _np(l.bias)}


def conv_transpose(l):
    return {"kernel": _np(l.kernel)[::-1].transpose(0, 2, 1),
            "bias": _np(l.bias)}


def dense(l):
    return {"kernel": _np(l.kernel), "bias": _np(l.bias)}


def layernorm(l):
    return {"scale": _np(l.gamma), "bias": _np(l.beta)}


def embedding(l):
    return {"embedding": _np(l.embeddings)}


def map_dilated_resnet(ref):
    """reference resnet.DilatedResnet1D -> flax DilatedResnet1D subtree."""
    out = {}
    for i, block in enumerate(ref.model.layers):  # ResnetConv1DBlock
        relu1, c1, relu2, c2 = block.model.layers
        out[f"ResnetConv1DBlock_{i}"] = {"Conv_0": conv(c1), "Conv_1": conv(c2)}
    return out


def map_encoder_block(ref):
    """reference encdec.EncoderConvBlock -> flax EncoderConvBlock subtree."""
    out = {}
    ci = ri = 0
    for l in ref.model.layers:
        if isinstance(l, tf.keras.layers.Conv1D):
            out[f"Conv_{ci}"] = conv(l)
            ci += 1
        else:  # DilatedResnet1D
            out[f"DilatedResnet1D_{ri}"] = map_dilated_resnet(l)
            ri += 1
    return out


def map_decoder_block(ref):
    """reference encdec.DecoderConvBlock -> flax DecoderConvBlock subtree."""
    out = {}
    ci = ti = ri = 0
    for l in ref.model.layers:
        if isinstance(l, tf.keras.layers.Conv1DTranspose):
            out[f"ConvTranspose_{ti}"] = conv_transpose(l)
            ti += 1
        elif isinstance(l, tf.keras.layers.Conv1D):
            out[f"Conv_{ci}"] = conv(l)
            ci += 1
        else:
            out[f"DilatedResnet1D_{ri}"] = map_dilated_resnet(l)
            ri += 1
    return out


def map_encoder(ref):
    return {f"EncoderConvBlock_{i}": map_encoder_block(b)
            for i, b in enumerate(ref.model.layers)}


def map_decoder(ref):
    out = {}
    di = 0
    for l in ref.model.layers:
        if isinstance(l, tf.keras.layers.Conv1D):
            out[f"Conv_{0}"] = conv(l)  # final projection (single Conv1D)
        else:
            out[f"DecoderConvBlock_{di}"] = map_decoder_block(l)
            di += 1
    return out


def map_fmha(ref_attn):
    """reference FactorizedAttention -> flax FactorizedAttention subtree."""
    mha = ref_attn.mha
    return {
        "qkv_conv": conv(ref_attn.qkv_conv),
        "q_proj": {"kernel": _np(mha._query_dense.kernel),
                   "bias": _np(mha._query_dense.bias)},
        "k_proj": {"kernel": _np(mha._key_dense.kernel),
                   "bias": _np(mha._key_dense.bias)},
        "v_proj": {"kernel": _np(mha._value_dense.kernel),
                   "bias": _np(mha._value_dense.bias)},
        "o_proj": {"kernel": _np(mha._output_dense.kernel),
                   "bias": _np(mha._output_dense.bias)},
        "proj": dense(ref_attn.proj),
    }


def map_transformer(ref_tf):
    out = {}
    for i, blk in enumerate(ref_tf.model.layers):  # ResidualAttnBlock
        out[f"layer_{i}"] = {
            "ln1": layernorm(blk.layernorm1),
            "ln2": layernorm(blk.layernorm2),
            "mlp": dense(blk.mlp),
            "fmha": map_fmha(blk.fmha),
        }
    return out


def map_conditioner(ref_cond):
    emb, dec_block, ln = ref_cond.model.layers
    return {
        "cond_embedding": embedding(emb),
        "upsampler": map_decoder_block(dec_block),
        "ln": layernorm(ln),
    }


def map_prior(ref_model, ref_label=None):
    out = {
        "x_embedding": embedding(ref_model.x_embedding),
        "x_pos_embedding": {"embeddings": _np(ref_model.x_pos_embedding.embeddings)},
        "transformer": map_transformer(ref_model.transformer),
        "out": dense(ref_model.out),
    }
    if ref_label is not None:
        out["label_conditioner"] = {"genre_emb": embedding(ref_label.genre_emb)}
    if hasattr(ref_model, "conditioner"):
        out["conditioner"] = map_conditioner(ref_model.conditioner)
    return out


def check_tree_port(ported, template, name):
    """Assert the ported tree has exactly the template's leaves/shapes."""
    t_leaves = jax.tree_util.tree_leaves_with_path(template)
    p = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(jnp.asarray, ported)))
    assert len(t_leaves) == len(p), (
        f"{name}: ported {len(p)} leaves != template {len(t_leaves)}")
    out = {}
    for path, leaf in t_leaves:
        assert path in p, f"{name}: missing {path}"
        assert p[path].shape == leaf.shape, (
            f"{name}: {path} shape {p[path].shape} != {leaf.shape}")
    return jax.tree_util.tree_map(lambda t, s: jnp.asarray(t), ported, template)


def tv_distance(a_tokens, b_tokens, bins):
    """Per-position total-variation distance between two empirical token
    distributions, max over positions; plus the expected two-sample noise."""
    n = a_tokens.shape[0]
    tvs = []
    for pos in range(a_tokens.shape[1]):
        pa = np.bincount(a_tokens[:, pos], minlength=bins) / n
        pb = np.bincount(b_tokens[:, pos], minlength=bins) / n
        tvs.append(0.5 * np.abs(pa - pb).sum())
    return float(np.max(tvs)), float(np.mean(tvs))


# ---------------------------------------------------------------------------
# geometry (small; full pattern schedule row/col/prev_row)
# ---------------------------------------------------------------------------

BINS = 17
WIDTH = 32
DEPTH = 3
HEADS = 2
BLOCKS = 4
DOWNS = [3, 2]
STRIDES = [2, 2]
SAMPLE_LEN = 1024            # z lengths: (128, 32)
CTX_TOP = SAMPLE_LEN // 32   # 32 (level 1)
CTX_UP = SAMPLE_LEN // 8     # 128 (level 0), cond rate 4

VCFG = VQVAEConfig(
    sample_length=SAMPLE_LEN, levels=2, latent_dim=8, codebook_size=BINS - 1,
    down_depth=tuple(DOWNS), strides=tuple(STRIDES), residual_width=8,
    residual_depth=2, dilation_factor=3, use_spectral_loss=False,
).validate()

results = {}


def port_prior(level):
    """Build reference + ours at `level`, port weights, return everything."""
    top = level == VCFG.levels - 1
    cond_kwargs = None if top else dict(
        residual_width=8, residual_depth=2, dilation_factor=3, dilation_cycle=4)
    ref = FMHABasedAutoregressiveModel(
        target_vocab_size=BINS, width=WIDTH, depth=DEPTH, blocks=BLOCKS,
        m_attn=0.25, m_mlp=1.0, heads=HEADS, attn_stacks=1, drop_out_rate=0.0,
        context_length=[CTX_TOP if top else CTX_UP],
        zq_shapes=[(CTX_UP,), (CTX_TOP,)], level=level, levels=VCFG.levels,
        pos_emb=True, downs=DOWNS, strides=STRIDES, cond_kwargs=cond_kwargs)
    ref_label = RefLabelConditioner(genre_bins=10, width=WIDTH)

    ctx = CTX_TOP if top else CTX_UP
    tokens_np = np.random.default_rng(3 + level).integers(
        0, BINS, size=(4, ctx)).astype(np.int64)
    y_np = np.array([0, 3, 7, 9], np.int64)
    x_cond_np = (None if top else np.random.default_rng(5).integers(
        0, BINS, size=(4, CTX_UP // 4)).astype(np.int64))

    # build reference weights with one call
    y_cond_tf = ref_label(tf.constant(y_np))
    ref_logits, _ = ref.call(
        tf.constant(tokens_np), training=False,
        x_cond=None if top else tf.constant(x_cond_np), y_cond=y_cond_tf)
    ref_logits = ref_logits.numpy()

    pcfg = PriorConfig(
        level=level, levels=VCFG.levels, bins=BINS, width=WIDTH, depth=DEPTH,
        heads=HEADS, blocks=BLOCKS, attn_stacks=1, dropout=0.0,
        genre_classes=10,
        conditioner=None if top else ConditionerConfig(
            residual_width=8, residual_depth=2, dilation_factor=3,
            dilation_cycle=4))
    model, template = init_prior(jax.random.PRNGKey(0), VCFG, pcfg)
    ported = {"params": map_prior(ref, ref_label)}
    params = check_tree_port(ported, template, f"prior level {level}")

    y_cond = model.apply(params, jnp.asarray(y_np), method=FMHAPrior.embed_labels)
    our_logits, _ = model.apply(
        params, jnp.asarray(tokens_np),
        None if top else jnp.asarray(x_cond_np), y_cond)
    dev = float(np.abs(ref_logits - np.asarray(our_logits)).max())
    return ref, ref_label, model, params, pcfg, dev, (tokens_np, y_np, x_cond_np)


# --- 1. top-level prior logits ---------------------------------------------
ref_top, ref_label_top, model_top, params_top, pcfg_top, dev_top, _ = port_prior(1)
results["top-level prior teacher-forced logits"] = dev_top
print(f"[1] top prior logits max deviation: {dev_top:.3e}")
assert dev_top <= 1e-4, dev_top

# --- 2. upsampler logits (x_cond + y_cond) ---------------------------------
(ref_up, ref_label_up, model_up, params_up, pcfg_up, dev_up,
 (_, y_np, x_cond_np)) = port_prior(0)
results["upsampler logits (x_cond via ConditionerNet)"] = dev_up
print(f"[2] upsampler logits max deviation: {dev_up:.3e}")
assert dev_up <= 1e-4, dev_up

# --- 3. sampled-token distribution: reference sample() vs our decode -------
N_SAMPLES = 2048
tf.random.set_seed(0)
y_all = tf.constant(np.full((N_SAMPLES,), 3, np.int64))
y_cond_tf = ref_label_top(y_all)
ref_tokens = ref_top.sample(N_SAMPLES, max_length=CTX_TOP,
                            y_cond=y_cond_tf).numpy().astype(np.int64)

decode = make_decode_fn(pcfg_top, CTX_TOP, N_SAMPLES)
y_cond_j = model_top.apply(params_top, jnp.full((N_SAMPLES,), 3, jnp.int32),
                           method=FMHAPrior.embed_labels)
our_tokens = np.asarray(decode(params_top, jax.random.PRNGKey(42), None,
                               y_cond_j)).astype(np.int64)
assert ref_tokens.shape == our_tokens.shape == (N_SAMPLES, CTX_TOP + 1)

tv_max, tv_mean = tv_distance(ref_tokens[:, 1:], our_tokens[:, 1:], BINS)
# two-sample multinomial TV noise bound over K=17 bins at n=2048 each:
# E[TV] <= sum_k sqrt(2 p_k (1-p_k) / (pi n/2)) / 2 ~ 0.05; gate at 3 sigma.
noise_bound = 0.10
results["sampled-token TV distance (max/mean over positions)"] = (tv_max, tv_mean)
print(f"[3] token-distribution TV: max {tv_max:.4f} mean {tv_mean:.4f} "
      f"(two-sample noise bound {noise_bound}) n={N_SAMPLES}")
assert tv_max < noise_bound, tv_max

# negative control: distributions from DIFFERENT weights must NOT match —
# proves the TV gate has teeth at this sample size.
_, rand_template = init_prior(jax.random.PRNGKey(123), VCFG, pcfg_top)
rand_tokens = np.asarray(
    make_decode_fn(pcfg_top, CTX_TOP, N_SAMPLES)(
        rand_template, jax.random.PRNGKey(7), None, None)).astype(np.int64)
tv_ctrl, _ = tv_distance(ref_tokens[:, 1:], rand_tokens[:, 1:], BINS)
print(f"    negative control (random weights): TV max {tv_ctrl:.4f}")
assert tv_ctrl > noise_bound, "control failed: TV gate has no power"

# --- 4. VQ-VAE: encoder codes identical, decoder recon parity --------------
from VectorQuantizer import VectorQuantizer as RefVQ  # noqa: E402

ref_enc = RefEncoder(output_dim=VCFG.latent_dim, residual_width=8,
                     residual_depth=2, depth=1, down_depth=[3], strides=[2],
                     dilation_factor=3)
ref_dec = RefDecoder(output_dim=1, embed_width=VCFG.latent_dim,
                     residual_width=8, residual_depth=2, depth=1,
                     down_depth=[3], strides=[2], dilation_factor=3)
ref_vq = RefVQ(num_embeddings=16, embedding_dim=VCFG.latent_dim)

audio = np.random.default_rng(11).standard_normal(
    (2, SAMPLE_LEN, 1)).astype(np.float32) * 0.1
z_e_tf = ref_enc(tf.constant(audio))
codes_tf = ref_vq.get_code_indices(tf.reshape(z_e_tf, (-1, VCFG.latent_dim))).numpy()
recon_tf = ref_dec(
    tf.reshape(tf.transpose(tf.gather(ref_vq.embeddings, codes_tf, axis=1)),
               tf.shape(z_e_tf))).numpy()

vcfg1 = VQVAEConfig(
    sample_length=SAMPLE_LEN, levels=1, latent_dim=VCFG.latent_dim,
    codebook_size=16, down_depth=(3,), strides=(2,), residual_width=8,
    residual_depth=2, dilation_factor=3, use_spectral_loss=False).validate()
_, template1 = None, init_vqvae(jax.random.PRNGKey(0), vcfg1)
vq_template, cb_template = template1
ported_vq = {"params": {"encoder_0": map_encoder(ref_enc),
                        "decoder_0": map_decoder(ref_dec)}}
vq_params = check_tree_port(ported_vq, vq_template, "vqvae level 0")
cb = CodebookState(embeddings=jnp.asarray(ref_vq.embeddings.numpy()),
                   m_t=cb_template[0].m_t, N_t=cb_template[0].N_t)

codes_j = vqvae_encode(vq_params, (cb,), vcfg1, jnp.asarray(audio))[0]
codes_match = int((np.asarray(codes_j).reshape(-1) == codes_tf).sum())
print(f"[4] VQ encode codes identical: {codes_match}/{codes_tf.size}")
assert codes_match == codes_tf.size

recon_j = vqvae_decode(vq_params, (cb,), vcfg1, codes_j)
dev_rec = float(np.abs(recon_tf - np.asarray(recon_j)).max())
results["VQ decode reconstruction"] = dev_rec
print(f"    VQ decode max deviation: {dev_rec:.3e}")
assert dev_rec <= 1e-5, dev_rec

# --- 5. EMA + dead-code-restart update law, from IDENTICAL state -----------
# One training quantize through both implementations starting from the SAME
# codebook/m_t/N_t on the SAME batch: the EMA statistics, usage mask and the
# updated embeddings of all USED codes must agree exactly — dead codes are
# re-seeded from framework-specific shuffles (tf.random.shuffle vs
# jax.random.permutation), the ONLY sanctioned divergence
# (VectorQuantizer.py:133-145).  This pins PARITY.md §2's trajectory gap on
# (init distributions + restart randomness), not the update law.
z_batch = np.random.default_rng(21).standard_normal((512, VCFG.latent_dim)) * 0.05
z_batch = z_batch.astype(np.float32)

ref_vq3 = RefVQ(num_embeddings=16, embedding_dim=VCFG.latent_dim)
init_emb = ref_vq3.embeddings.numpy().copy()
init_m = ref_vq3.m_t.numpy().copy()
init_n = ref_vq3.N_t.numpy().copy()
_ = ref_vq3(tf.constant(z_batch), training=True)

ours0 = CodebookState(embeddings=jnp.asarray(init_emb),
                      m_t=jnp.asarray(init_m), N_t=jnp.asarray(init_n))
out = quantize(ours0, jnp.asarray(z_batch), train=True,
               rng=jax.random.PRNGKey(0), use_pallas=False)

np.testing.assert_allclose(np.asarray(out.state.m_t), ref_vq3.m_t.numpy(),
                           rtol=1e-6, atol=1e-7)
np.testing.assert_allclose(np.asarray(out.state.N_t), ref_vq3.N_t.numpy(),
                           rtol=1e-6, atol=1e-7)
used = np.asarray(out.state.N_t) >= 1.0
used_ref = ref_vq3.N_t.numpy() >= 1.0
np.testing.assert_array_equal(used, used_ref)
emb_dev = float(np.abs(np.asarray(out.state.embeddings)[:, used]
                       - ref_vq3.embeddings.numpy()[:, used]).max())
results["EMA update law (m_t/N_t/used-code embeddings)"] = emb_dev
print(f"[5] EMA+restart from identical state: used codes "
      f"{int(used.sum())}/16 identical, used-embedding max dev {emb_dev:.3e}")
assert emb_dev <= 1e-6

print("\nALL WEIGHT-PORT PARITY CHECKS PASSED")
for k, v in results.items():
    print(f"  {k}: {v}")
