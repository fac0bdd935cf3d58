"""Fused similarity kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yoloclip_tpu.ops.pallas.similarity import (
    fused_projected_similarity_argmax, fused_similarity_argmax,
    similarity_argmax_reference)


def normed(rng, shape):
    x = rng.randn(*shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.mark.parametrize('A,C,E', [(525, 80, 64), (700, 130, 128)])
def test_fused_matches_reference(A, C, E):
    rng = np.random.RandomState(0)
    obj = jnp.asarray(normed(rng, (A, E)))
    text = jnp.asarray(normed(rng, (C, E)))
    want_s, want_i = similarity_argmax_reference(obj, text)
    got_s, got_i = fused_similarity_argmax(obj, text, tile_a=256, tile_c=128,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_fused_masks_invalid_classes():
    rng = np.random.RandomState(1)
    obj = jnp.asarray(normed(rng, (256, 64)))
    text = jnp.asarray(normed(rng, (96, 64)))
    nv = jnp.int32(50)
    want_s, want_i = similarity_argmax_reference(obj, text, nv)
    got_s, got_i = fused_similarity_argmax(obj, text, nv, tile_a=128,
                                           tile_c=64, interpret=True)
    assert (np.asarray(got_i) < 50).all()
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5)


@pytest.mark.parametrize('A,C,E', [(525, 80, 64), (300, 130, 128)])
def test_fused_normalize_obj_in_kernel(A, C, E):
    """normalize_obj=True takes RAW obj rows (incl. large scales and a
    near-zero row) and must equal normalizing outside the kernel."""
    rng = np.random.RandomState(3)
    raw = rng.randn(A, E).astype(np.float32)
    raw *= rng.uniform(0.01, 50.0, size=(A, 1)).astype(np.float32)
    raw[7] = 0.0                      # degenerate row: guarded norm
    obj_n = raw / np.maximum(
        np.linalg.norm(raw, axis=-1, keepdims=True), 1e-12)
    text = jnp.asarray(normed(rng, (C, E)))
    want_s, want_i = similarity_argmax_reference(jnp.asarray(obj_n), text)
    got_s, got_i = fused_similarity_argmax(jnp.asarray(raw), text,
                                           tile_a=256, tile_c=64,
                                           interpret=True,
                                           normalize_obj=True)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('A,C,K,E', [(525, 80, 64, 128), (300, 130, 128, 256)])
def test_folded_projection_matches_project_then_score(A, C, K, E):
    """fused_projected_similarity_argmax(h, text, W, b) must equal
    normalize(h @ W + b) @ text^T -> max/argmax (the obj_2 fold)."""
    rng = np.random.RandomState(5)
    h = rng.randn(A, K).astype(np.float32)
    h[3] = 0.0                        # zero hidden row: norm = ||b|| > 0
    W = (rng.randn(K, E) / np.sqrt(K)).astype(np.float32)
    b = (0.1 * rng.randn(E)).astype(np.float32)
    text = jnp.asarray(normed(rng, (C, E)))
    obj = h @ W + b
    obj_n = obj / np.maximum(
        np.linalg.norm(obj, axis=-1, keepdims=True), 1e-12)
    want_s, want_i = similarity_argmax_reference(jnp.asarray(obj_n), text)
    got_s, got_i = fused_projected_similarity_argmax(
        jnp.asarray(h), text, jnp.asarray(W), jnp.asarray(b),
        tile_a=256, tile_c=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-5)


def test_folded_projection_batched_and_masked():
    """Per-image text batching + num_valid masking through the folded path."""
    rng = np.random.RandomState(6)
    B, A, C, K, E = 2, 260, 70, 64, 128
    h = jnp.asarray(rng.randn(B, A, K).astype(np.float32))
    W = jnp.asarray((rng.randn(K, E) / 8.0).astype(np.float32))
    b = jnp.asarray((0.1 * rng.randn(E)).astype(np.float32))
    text = jnp.asarray(normed(rng, (B, C, E)))
    nv = jnp.int32(33)
    got_s, got_i = fused_projected_similarity_argmax(
        h, text, W, b, nv, tile_a=128, tile_c=32, interpret=True)
    assert (np.asarray(got_i) < 33).all()
    for bi in range(B):
        obj = np.asarray(h[bi]) @ np.asarray(W) + np.asarray(b)
        obj_n = obj / np.linalg.norm(obj, axis=-1, keepdims=True)
        want_s, want_i = similarity_argmax_reference(
            jnp.asarray(obj_n), text[bi], nv)
        np.testing.assert_array_equal(np.asarray(got_i[bi]),
                                      np.asarray(want_i))
        np.testing.assert_allclose(np.asarray(got_s[bi]),
                                   np.asarray(want_s), rtol=1e-4, atol=1e-5)


def test_fused_batched_per_image_text():
    """(B, A, E) obj against per-image (B, C, E) text: each batch element
    must be scored against ITS OWN text matrix."""
    rng = np.random.RandomState(2)
    B, A, C, E = 3, 300, 40, 64
    obj = jnp.asarray(normed(rng, (B, A, E)))
    text = jnp.asarray(normed(rng, (B, C, E)))
    got_s, got_i = fused_similarity_argmax(obj, text, tile_a=128,
                                           tile_c=64, interpret=True)
    assert got_s.shape == (B, A) and got_i.shape == (B, A)
    for b in range(B):
        want_s, want_i = similarity_argmax_reference(obj[b], text[b])
        np.testing.assert_allclose(np.asarray(got_s[b]),
                                   np.asarray(want_s), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_i[b]),
                                      np.asarray(want_i))
    # cross-check: element 1 scored against text[0] would NOT match
    alt_s, _ = similarity_argmax_reference(obj[1], text[0])
    assert np.abs(np.asarray(alt_s) - np.asarray(got_s[1])).max() > 1e-3
