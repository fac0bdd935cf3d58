"""CLIP ViT-B/32 text transformer in flax (63M params: 12 layers, width 512,
8 heads, 77-token causal context, 49408-token vocab, 512-d projection).

The reference wraps OpenAI's `clip.load("ViT-B/32")` and calls
`encode_text` (`/root/reference/yolo_clip_detector/clip/text_encoder.py:37,
81-87`). This is a from-scratch JAX implementation of that public
architecture: token + positional embeddings, pre-LN residual attention
blocks with QuickGELU MLPs, final LayerNorm, features gathered at the EOT
position, matmul with the text projection.

`convert_openai_state_dict` maps a torch CLIP checkpoint (the
`state_dict()` of the full model or just its text tower) into this module's
parameter tree so released weights load directly once available on disk.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yoloclip_tpu.models.layers import MultiHeadAttention


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name='ln_1')(x)
        x = x + MultiHeadAttention(self.width, self.heads, dtype=self.dtype,
                                   name='attn')(h, h, h, attn_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name='ln_2')(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype,
                     param_dtype=jnp.float32, name='c_fc')(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype,
                     param_dtype=jnp.float32, name='c_proj')(h)
        return x + h


class CLIPTextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: (B, context_length) int32 -> (B, output_dim) embeddings
        (UNnormalized; callers L2-normalize, ref `text_encoder.py:85`)."""
        tok_emb = self.param(
            'token_embedding', nn.initializers.normal(0.02),
            (self.vocab_size, self.width), jnp.float32)
        pos_emb = self.param(
            'positional_embedding', nn.initializers.normal(0.01),
            (self.context_length, self.width), jnp.float32)

        x = tok_emb[tokens].astype(self.dtype) + pos_emb.astype(self.dtype)

        L = self.context_length
        causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       dtype=self.dtype,
                                       name=f'resblocks_{i}')(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name='ln_final')(x)

        # Features at the EOT token (highest token id in each row).
        eot_idx = jnp.argmax(tokens, axis=-1)
        feats = x[jnp.arange(x.shape[0]), eot_idx]
        text_proj = self.param(
            'text_projection', nn.initializers.normal(self.width ** -0.5),
            (self.width, self.output_dim), jnp.float32)
        return (feats @ text_proj.astype(self.dtype)).astype(jnp.float32)


def convert_openai_state_dict(state_dict: Dict[str, Any],
                              layers: int = None) -> Dict[str, Any]:
    """torch CLIP text-tower state_dict -> flax param tree for this module.

    Accepts numpy arrays or anything with `.numpy()`/`__array__` (torch
    tensors). Key layout follows the public OpenAI checkpoint
    (`transformer.resblocks.{i}.attn.in_proj_weight`, etc.); full-model
    dumps work too (`visual.*`/`logit_scale` keys are simply not read).
    `layers=None` infers the depth from the resblock keys, so truncated /
    miniature checkpoints in the same layout convert as well
    (tests/test_text.py::test_openai_checkpoint_chain_end_to_end).
    """
    if layers is None:
        layers = 0
        while (f'transformer.resblocks.{layers}.ln_1.weight'
               in state_dict):
            layers += 1
        if layers == 0:
            raise KeyError(
                'no transformer.resblocks.*.ln_1.weight keys found -- not '
                'an OpenAI CLIP text-tower state_dict')

    def a(key):
        v = state_dict[key]
        if hasattr(v, 'detach'):
            v = v.detach().cpu().float().numpy()
        return np.asarray(v, np.float32)

    params: Dict[str, Any] = {
        'token_embedding': a('token_embedding.weight'),
        'positional_embedding': a('positional_embedding'),
        'text_projection': a('text_projection'),
        'ln_final': {'scale': a('ln_final.weight'),
                     'bias': a('ln_final.bias')},
    }
    for i in range(layers):
        p = f'transformer.resblocks.{i}.'
        params[f'resblocks_{i}'] = {
            'ln_1': {'scale': a(p + 'ln_1.weight'),
                     'bias': a(p + 'ln_1.bias')},
            'ln_2': {'scale': a(p + 'ln_2.weight'),
                     'bias': a(p + 'ln_2.bias')},
            'attn': {
                'in_proj_weight': a(p + 'attn.in_proj_weight'),
                'in_proj_bias': a(p + 'attn.in_proj_bias'),
                'out_proj_weight': a(p + 'attn.out_proj.weight'),
                'out_proj_bias': a(p + 'attn.out_proj.bias'),
            },
            # torch Linear stores (out, in); flax Dense kernels are (in, out).
            'c_fc': {'kernel': a(p + 'mlp.c_fc.weight').T,
                     'bias': a(p + 'mlp.c_fc.bias')},
            'c_proj': {'kernel': a(p + 'mlp.c_proj.weight').T,
                       'bias': a(p + 'mlp.c_proj.bias')},
        }
    return params
