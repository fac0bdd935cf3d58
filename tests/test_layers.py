"""Parity tests for building blocks against torch (CPU) with shared weights.

The reference is torch; these tests re-express its per-layer math in torch
directly (not copied code) and assert our NHWC/flax blocks match numerically
when loaded with identical weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from yoloclip_tpu.models.layers import (ConvBlock, MultiHeadAttention,
                                        adaptive_max_pool_2d, max_pool_same)

RNG = np.random.RandomState(0)


def torch_conv_bn_silu(x_nchw, w_oihw, bn_gamma, bn_beta, bn_mean, bn_var,
                       stride=1, padding=1):
    x = torch.from_numpy(x_nchw)
    y = tF.conv2d(x, torch.from_numpy(w_oihw), stride=stride, padding=padding)
    y = tF.batch_norm(y, torch.from_numpy(bn_mean), torch.from_numpy(bn_var),
                      torch.from_numpy(bn_gamma), torch.from_numpy(bn_beta),
                      training=False, eps=1e-5)
    return tF.silu(y).numpy()


@pytest.mark.parametrize('k,stride', [(3, 1), (3, 2), (1, 1)])
def test_conv_block_matches_torch(k, stride):
    cin, cout = 8, 16
    x = RNG.randn(2, 20, 20, cin).astype(np.float32)
    block = ConvBlock(cout, kernel_size=k, stride=stride)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # Overwrite with random weights + nontrivial BN stats.
    w_hwio = RNG.randn(k, k, cin, cout).astype(np.float32) * 0.1
    gamma = RNG.rand(cout).astype(np.float32) + 0.5
    beta = RNG.randn(cout).astype(np.float32) * 0.1
    mean = RNG.randn(cout).astype(np.float32) * 0.1
    var = RNG.rand(cout).astype(np.float32) + 0.5
    variables = {
        'params': {'conv': {'kernel': jnp.asarray(w_hwio)},
                   'bn': {'scale': jnp.asarray(gamma),
                          'bias': jnp.asarray(beta)}},
        'batch_stats': {'bn': {'mean': jnp.asarray(mean),
                               'var': jnp.asarray(var)}},
    }
    got = np.asarray(block.apply(variables, jnp.asarray(x)))

    w_oihw = w_hwio.transpose(3, 2, 0, 1)
    want = torch_conv_bn_silu(x.transpose(0, 3, 1, 2), w_oihw, gamma, beta,
                              mean, var, stride=stride, padding=k // 2)
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_max_pool_same_matches_torch():
    x = RNG.randn(1, 13, 13, 4).astype(np.float32)
    got = np.asarray(max_pool_same(jnp.asarray(x), 5))
    want = tF.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         kernel_size=5, stride=1, padding=2).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=1e-6)


@pytest.mark.parametrize('hw', [(80, 80), (20, 20), (13, 7)])
def test_adaptive_max_pool_matches_torch(hw):
    H, W = hw
    x = RNG.randn(2, H, W, 6).astype(np.float32)
    got = np.asarray(adaptive_max_pool_2d(jnp.asarray(x), (3, 3)))
    want = tF.adaptive_max_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), (3, 3)).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=1e-6)


def test_multihead_attention_matches_torch():
    E, H = 32, 4
    mha_t = tnn.MultiheadAttention(E, H, batch_first=True)
    q = RNG.randn(2, 5, E).astype(np.float32)
    kv = RNG.randn(2, 9, E).astype(np.float32)
    with torch.no_grad():
        want, _ = mha_t(torch.from_numpy(q), torch.from_numpy(kv),
                        torch.from_numpy(kv))
    want = want.numpy()

    mha_j = MultiHeadAttention(E, H)
    variables = {'params': {
        'in_proj_weight': jnp.asarray(mha_t.in_proj_weight.detach().numpy()),
        'in_proj_bias': jnp.asarray(mha_t.in_proj_bias.detach().numpy()),
        'out_proj_weight': jnp.asarray(
            mha_t.out_proj.weight.detach().numpy()),
        'out_proj_bias': jnp.asarray(mha_t.out_proj.bias.detach().numpy()),
    }}
    got = np.asarray(mha_j.apply(variables, jnp.asarray(q), jnp.asarray(kv),
                                 jnp.asarray(kv)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_s2d_kernel3_exact_vs_strided_conv():
    """The space-to-depth rewrite of a 3x3/stride-2 conv is exact:
    conv(x, w3, s=2, pad=1) == conv(s2d(x), s2d_kernel3(w3), s=1,
    pad=((1,0),(1,0)))."""
    from yoloclip_tpu.models.layers import s2d_kernel3, space_to_depth2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 48, 3), jnp.float32)
    w3 = jnp.asarray(rng.randn(3, 3, 3, 16) * 0.2, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w3, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    got = jax.lax.conv_general_dilated(
        space_to_depth2(x), s2d_kernel3(w3), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    assert got.shape == ref.shape == (2, 16, 24, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_block_s2d_matches_plain():
    """ConvBlock(s2d=True) reuses the canonical (3,3,C,O) params (same
    tree path 'conv'/'kernel') and produces the plain block's output."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    plain = ConvBlock(16, 3, 2)
    s2d = ConvBlock(16, 3, 2, s2d=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    v2 = s2d.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))
    a = plain.apply(variables, x)
    b = s2d.apply(variables, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_stem_s2d_composite_parity():
    """YOLOCLIP(stem_s2d=True) serves a stem_s2d=False checkpoint with
    identical outputs (the flag is a pure execution-layout choice)."""
    import dataclasses

    from yoloclip_tpu.config import ModelConfig
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP

    cfg = ModelConfig(image_size=(64, 64))
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    text = jnp.asarray(rng.randn(4, 512), jnp.float32)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    model = YOLOCLIP(cfg)
    variables = model.init(jax.random.PRNGKey(0), images, text)
    m2 = YOLOCLIP(dataclasses.replace(cfg, stem_s2d=True))
    out = model.apply(variables, images, text)
    out2 = m2.apply(variables, images, text)
    for k in ('boxes', 'scores', 'class_ids'):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(out2[k]),
                                   rtol=1e-5, atol=1e-5)


def test_conv_block_s2d_gradients_match():
    """The s2d execution layout is a linear re-indexing: parameter
    gradients through ConvBlock(s2d=True) equal the plain block's (so
    the flag is safe in TRAINING graphs too, not just serving)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    plain = ConvBlock(16, 3, 2)
    s2d = ConvBlock(16, 3, 2, s2d=True)
    variables = plain.init(jax.random.PRNGKey(0), x)

    def loss(params, model):
        y = model.apply({'params': params,
                         'batch_stats': variables['batch_stats']}, x)
        return jnp.sum(y * y)

    g1 = jax.grad(loss)(variables['params'], plain)
    g2 = jax.grad(loss)(variables['params'], s2d)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_conv_block_s2d_pre_u8_matches_plain():
    """ConvBlock(s2d_pre=True) consumes the uint8-scaled space-to-depth
    canvas with /255 folded into the kernel at apply time: same canonical
    (3,3,C,O) params (tree-identical checkpoints), same output as the
    plain block fed x/255."""
    from yoloclip_tpu.models.layers import space_to_depth2
    rng = np.random.RandomState(5)
    xu8 = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    x = jnp.asarray(xu8, jnp.float32) / 255.0
    xs = space_to_depth2(jnp.asarray(xu8))
    assert xs.dtype == jnp.uint8
    plain = ConvBlock(16, 3, 2)
    pre = ConvBlock(16, 3, 2, s2d_pre=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    v2 = pre.init(jax.random.PRNGKey(0), xs)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))
    a = plain.apply(variables, x)
    b = pre.apply(variables, xs)
    assert a.shape == b.shape == (2, 32, 32, 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_conv_block_s2d_pre_rejects_s2d_combo():
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(1, 16, 16, 12), jnp.float32)
    bad = ConvBlock(16, 3, 2, s2d=True, s2d_pre=True)
    with pytest.raises(ValueError):
        bad.init(jax.random.PRNGKey(0), x)


def test_conv_block_s2d_rejects_non_3x3_s2():
    """s2d/s2d_pre on a block the rewrite cannot apply to must raise,
    not silently fall through to a plain conv on the wrong layout."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(1, 16, 16, 12), jnp.float32)
    for kw in (dict(s2d_pre=True), dict(s2d=True)):
        with pytest.raises(ValueError):
            ConvBlock(16, 1, 2, **kw).init(jax.random.PRNGKey(0), x)
        with pytest.raises(ValueError):
            ConvBlock(16, 3, 1, **kw).init(jax.random.PRNGKey(0), x)
