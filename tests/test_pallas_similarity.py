"""Fused similarity kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yoloclip_tpu.ops.pallas.similarity import (fused_similarity_argmax,
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
