"""Frozen CLIP text encoder with on-device embedding cache.

API parity with `/root/reference/yolo_clip_detector/clip/text_encoder.py:9-113`
(`__call__` over flat or nested prompt lists with L2 normalization and
multi-prompt averaging; `encode_vocabulary` with the "a photo of a {}"
template), redesigned TPU-first:

  * The transformer runs as ONE jitted program over a (N, 77) token batch;
    prompt lists are bucketed to power-of-two batch sizes so recompiles stop
    after a few shapes.
  * Results are cached per prompt string -- the reference re-encodes every
    training step (`model/yolo_clip.py:130-165`, flagged in SURVEY §3.2 as
    the single biggest wasted cost); here each unique prompt is encoded
    exactly once per process.
  * Weights are frozen by construction: they live in a closed-over param
    tree that no optimizer ever sees (the functional equivalent of the
    reference's requires_grad_(False) loop, `text_encoder.py:40-42`).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from yoloclip_tpu.text.model import CLIPTextTransformer, convert_openai_state_dict
from yoloclip_tpu.text.tokenizer import CLIPTokenizer, default_tokenizer


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


class CLIPTextEncoder:
    def __init__(self,
                 model_name: str = 'ViT-B/32',
                 embed_dim: int = 512,
                 params=None,
                 checkpoint_path: Optional[str] = None,
                 tokenizer: Optional[CLIPTokenizer] = None,
                 seed: int = 0,
                 dtype: str = 'float32'):
        if model_name != 'ViT-B/32':
            raise ValueError(
                f'Only ViT-B/32 text tower is implemented (got {model_name})')
        self.embed_dim = embed_dim
        self.tokenizer = tokenizer or default_tokenizer()
        cdtype = jnp.bfloat16 if dtype == 'bfloat16' else jnp.float32

        if params is None and checkpoint_path is not None:
            params = load_text_tower_params(checkpoint_path)
        if params is not None:
            # Architecture follows the CHECKPOINT (vocab/width/context/
            # depth from param shapes, heads = width/64 per the OpenAI
            # family), so miniature fixtures and future tower sizes load
            # without code changes. output_dim must match the detector's
            # embed_dim -- that is the contract with the vision side.
            vocab_size, width = np.shape(params['token_embedding'])
            out_dim = int(np.shape(params['text_projection'])[1])
            if out_dim != embed_dim:
                raise ValueError(
                    f'text checkpoint projects to {out_dim}-d but the '
                    f'model expects embed_dim={embed_dim}')
            self.model = CLIPTextTransformer(
                vocab_size=int(vocab_size), width=int(width),
                context_length=int(np.shape(
                    params['positional_embedding'])[0]),
                layers=sum(1 for k in params if k.startswith('resblocks_')),
                heads=max(int(width) // 64, 1),
                output_dim=embed_dim, dtype=cdtype)
        else:
            self.model = CLIPTextTransformer(output_dim=embed_dim,
                                             dtype=cdtype)
        self.random_init = params is None
        if params is None:
            # Random init: correct shapes/architecture for bring-up; real
            # zero-shot quality needs converted OpenAI weights on disk.
            dummy = jnp.zeros((1, 77), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(seed), dummy)['params']
        self.params = params
        self._cache: Dict[str, np.ndarray] = {}

        @functools.partial(jax.jit, static_argnums=())
        def _encode(params, tokens):
            feats = self.model.apply({'params': params}, tokens)
            norm = jnp.maximum(
                jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
            return feats / norm

        self._encode = _encode

    def encode_tokens(self, tokens: np.ndarray) -> jax.Array:
        """(N, 77) int32 -> (N, E) L2-normalized embeddings."""
        return self._encode(self.params, jnp.asarray(tokens))

    def _encode_prompts(self, prompts: Sequence[str]) -> np.ndarray:
        missing = [p for p in prompts if p not in self._cache]
        if missing:
            tokens = self.tokenizer.tokenize(missing)
            n = tokens.shape[0]
            b = _bucket(n)
            if b != n:   # pad batch to bucket size to bound recompiles
                tokens = np.concatenate(
                    [tokens, np.tile(tokens[-1:], (b - n, 1))], axis=0)
            emb = np.asarray(self.encode_tokens(tokens))[:n]
            for p, e in zip(missing, emb):
                self._cache[p] = e
        return np.stack([self._cache[p] for p in prompts])

    def __call__(self, text_prompts: Union[Sequence[str], Sequence[Sequence[str]]]
                 ) -> jax.Array:
        """Flat list -> (N, E); nested lists -> (len, E) where each row is
        the mean of that sample's prompt embeddings (ref
        `text_encoder.py:46-87`). Normalized; averaging happens on the
        normalized vectors exactly like the reference (mean WITHOUT
        renormalize in the nested path)."""
        if len(text_prompts) == 0:
            return jnp.zeros((0, self.embed_dim), jnp.float32)
        if isinstance(text_prompts[0], (list, tuple)):
            rows = []
            for prompts in text_prompts:
                emb = self._encode_prompts(list(prompts))
                rows.append(emb.mean(axis=0))
            return jnp.asarray(np.stack(rows))
        return jnp.asarray(self._encode_prompts(list(text_prompts)))

    def encode_vocabulary(self, vocabulary: Sequence[str]) -> jax.Array:
        """Ref `text_encoder.py:89-101`: "a photo of a {}" template."""
        return self(['a photo of a ' + v for v in vocabulary])

    def quality_issues(self) -> List[str]:
        """Degraded-quality conditions a serving stack must surface:
        embeddings from a random-init tower or a zero-merge tokenizer look
        structurally valid but carry no CLIP semantics."""
        issues = []
        if self.random_init:
            issues.append(
                'text tower is RANDOM-INIT (no CLIP weights): pass '
                'text_checkpoint= / params=, or convert a reference .pth '
                'with yoloclip_tpu.utils.convert.load_reference_checkpoint')
        if getattr(self.tokenizer, 'degraded', False):
            issues.append(
                'tokenizer runs in zero-merge byte mode (no BPE table): '
                'set CLIP_BPE_PATH to bpe_simple_vocab_16e6.txt.gz or place '
                'it in ~/.cache/clip/')
        return issues

    # The reference exposes freeze/unfreeze toggles (`text_encoder.py:103-113`).
    # Here freezing is structural: params are not part of any train state.
    # `trainable_params()` exists for a future fine-tuning path.
    def trainable_params(self):
        return self.params


def load_text_tower_params(path: str):
    """Load converted params from .npz / orbax dir / torch state_dict file."""
    import os
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path)
    if path.endswith('.npz'):
        data = np.load(path, allow_pickle=False)
        tree: Dict = {}
        for flat_key, v in data.items():
            parts = flat_key.split('/')
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        return tree
    # torch checkpoint (.pt/.pth): full CLIP or text-tower state dict
    import torch
    sd = torch.load(path, map_location='cpu')
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    return convert_openai_state_dict(sd)


def save_text_tower_params(params, path: str) -> None:
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f'{prefix}/{k}' if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, '')
    np.savez(path, **flat)
