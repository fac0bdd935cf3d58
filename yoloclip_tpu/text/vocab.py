"""Vocabulary builder: prompt-template expansion + embedding cache.

Behavioral contract from
`/root/reference/yolo_clip_detector/clip/vocab_builder.py:12-163`:
  * 5 default templates ("a photo of a {}", "a photograph of a {}",
    "an image of a {}", "a picture of a {}", "{}").
  * build_online_vocabulary: encode all templates x classes, reshape
    (N, T, E), mean over templates, renormalize -> (N, E).
  * build_offline_vocabulary: same + JSON persistence {class: [512 floats]}.
  * load_offline_vocabulary: JSON -> arrays.
  * get_vocabulary_matrix: cache-backed per-class lookup.

TPU notes: the matrix is built ONCE per vocabulary and handed to the jitted
detection graph as a plain array; per-prompt embeddings are additionally
cached inside CLIPTextEncoder so overlapping vocabularies reuse work.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from yoloclip_tpu.text.encoder import CLIPTextEncoder

DEFAULT_TEMPLATES = [
    'a photo of a {}',
    'a photograph of a {}',
    'an image of a {}',
    'a picture of a {}',
    '{}',
]


class VocabularyBuilder:
    def __init__(self, text_encoder: CLIPTextEncoder,
                 prompt_templates: Optional[Sequence[str]] = None):
        self.text_encoder = text_encoder
        self.prompt_templates = list(prompt_templates or DEFAULT_TEMPLATES)
        self.offline_vocab: Dict[str, np.ndarray] = {}

    def build_online_vocabulary(self, class_names: Sequence[str]) -> jnp.ndarray:
        """(num_classes, E): template-averaged, renormalized embeddings."""
        prompts = [t.format(name) for name in class_names
                   for t in self.prompt_templates]
        emb = np.asarray(self.text_encoder(prompts))
        emb = emb.reshape(len(class_names), len(self.prompt_templates), -1)
        emb = emb.mean(axis=1)
        emb = emb / np.maximum(
            np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return jnp.asarray(emb)

    def build_offline_vocabulary(self, class_names: Sequence[str],
                                 save_path: Optional[str] = None
                                 ) -> Dict[str, np.ndarray]:
        emb = np.asarray(self.build_online_vocabulary(class_names))
        vocab = {name: emb[i] for i, name in enumerate(class_names)}
        if save_path is not None:
            d = os.path.dirname(save_path)
            if d:
                os.makedirs(d, exist_ok=True)
            with open(save_path, 'w') as f:
                json.dump({k: v.tolist() for k, v in vocab.items()}, f)
        self.offline_vocab = vocab
        return vocab

    def load_offline_vocabulary(self, path: str) -> Dict[str, np.ndarray]:
        with open(path) as f:
            raw = json.load(f)
        self.offline_vocab = {k: np.asarray(v, np.float32)
                              for k, v in raw.items()}
        return self.offline_vocab

    def get_vocabulary_matrix(self,
                              class_names: Optional[Sequence[str]] = None
                              ) -> jnp.ndarray:
        if class_names is None:
            class_names = list(self.offline_vocab.keys())
        if not self.offline_vocab:
            self.build_offline_vocabulary(class_names)
        rows = []
        missing = [n for n in class_names if n not in self.offline_vocab]
        if missing:
            emb = np.asarray(self.build_online_vocabulary(missing))
            for n, e in zip(missing, emb):
                self.offline_vocab[n] = e
        for name in class_names:
            rows.append(self.offline_vocab[name])
        return jnp.asarray(np.stack(rows))
