"""Tap-matmul conv path (nn/resnet.py round 3) == nn.Conv path.

The TPU-side win is measured in scripts/conv_lab.py (1.4-2.1x); these tests
pin the equivalence contract on CPU: identical parameter trees and inits,
matching forwards and grads at f32, and the dilation>length edge.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vae_music_tpu.nn.resnet import DilatedResnet1D, ResnetConv1DBlock


def _pair(depth=3, factor=3, cycle=None, dtype=jnp.float32, width=8):
    kw = dict(input_dim=width, depth=depth, dilation_factor=factor,
              dilation_cycle=cycle, dtype=dtype)
    return (DilatedResnet1D(conv_impl="conv", **kw),
            DilatedResnet1D(conv_impl="tap", **kw))


def test_param_trees_and_inits_identical():
    conv, tap = _pair()
    x = jnp.ones((2, 16, 8))
    pc = conv.init(jax.random.PRNGKey(7), x)
    pt = tap.init(jax.random.PRNGKey(7), x)
    assert jax.tree_util.tree_structure(pc) == jax.tree_util.tree_structure(pt)
    for a, b in zip(jax.tree_util.tree_leaves(pc),
                    jax.tree_util.tree_leaves(pt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_matches_conv_f32():
    conv, tap = _pair(depth=4, factor=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 8))
    p = conv.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(np.asarray(conv.apply(p, x)),
                               np.asarray(tap.apply(p, x)),
                               rtol=1e-5, atol=1e-5)


def test_forward_matches_with_cycle_and_reverse():
    for rev in (False, True):
        kw = dict(input_dim=8, depth=6, dilation_factor=3, dilation_cycle=4,
                  reverse_dilation=rev)
        conv = DilatedResnet1D(conv_impl="conv", **kw)
        tap = DilatedResnet1D(conv_impl="tap", **kw)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 40, 8))
        p = conv.init(jax.random.PRNGKey(3), x)
        np.testing.assert_allclose(np.asarray(conv.apply(p, x)),
                                   np.asarray(tap.apply(p, x)),
                                   rtol=1e-5, atol=1e-5)


def test_dilation_longer_than_sequence():
    # SAME conv with dilation >= T: side taps contribute nothing.
    blk_c = ResnetConv1DBlock(8, 8, dilation=16, conv_impl="conv")
    blk_t = ResnetConv1DBlock(8, 8, dilation=16, conv_impl="tap")
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 8))
    p = blk_c.init(jax.random.PRNGKey(5), x)
    np.testing.assert_allclose(np.asarray(blk_c.apply(p, x)),
                               np.asarray(blk_t.apply(p, x)),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_conv_f32():
    conv, tap = _pair(depth=2, factor=3)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 30, 8))
    p = conv.init(jax.random.PRNGKey(7), x)

    def loss(model, params):
        return jnp.sum(model.apply(params, x) ** 2)

    gc = jax.grad(lambda pp: loss(conv, pp))(p)
    gt = jax.grad(lambda pp: loss(tap, pp))(p)
    for a, b in zip(jax.tree_util.tree_leaves(gc),
                    jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_causal_tap_matches_nn_conv():
    import flax.linen as nn

    from vae_music_tpu.nn.resnet import TapConv3
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 25, 8))
    conv = nn.Conv(12, (3,), padding="CAUSAL")
    tap = TapConv3(12, padding="CAUSAL")
    p = conv.init(jax.random.PRNGKey(11), x)
    pt = tap.init(jax.random.PRNGKey(11), x)
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(pt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(conv.apply(p, x)),
                               np.asarray(tap.apply(p, x)),
                               rtol=1e-5, atol=1e-5)


def test_factorized_attention_tap_equals_conv():
    from vae_music_tpu.nn.attention import COL, PREV_ROW, ROW, FactorizedAttention
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 24, 16))
    for pattern in (ROW, COL, PREV_ROW):
        kw = dict(ctx_len=24, num_heads=2, d_model=16, blocks=4,
                  attn_func=pattern, m_attn=0.5)
        att_c = FactorizedAttention(conv_impl="conv", **kw)
        att_t = FactorizedAttention(conv_impl="tap", **kw)
        p = att_c.init(jax.random.PRNGKey(13), x)
        np.testing.assert_allclose(np.asarray(att_c.apply(p, x)),
                                   np.asarray(att_t.apply(p, x)),
                                   rtol=1e-5, atol=1e-5)


def test_bf16_path_close():
    conv, tap = _pair(dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 32, 8), jnp.bfloat16)
    p = conv.init(jax.random.PRNGKey(9), x)
    a = np.asarray(conv.apply(p, x), np.float32)
    b = np.asarray(tap.apply(p, x), np.float32)
    np.testing.assert_allclose(a, b, rtol=0.1, atol=0.1)
    assert tap.apply(p, x).dtype == jnp.bfloat16
