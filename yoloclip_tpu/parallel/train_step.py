"""Sharded training & inference steps over a ('data', 'model') mesh.

No reference equivalent (SURVEY §2.2: the reference has zero distributed
support). Built fresh for TPU:

  * Data parallelism: batch dims sharded over 'data', params/opt_state
    replicated; jit+GSPMD inserts the psum gradient all-reduce over ICI.
  * Vocabulary ("class") tensor parallelism: with LVIS-scale prompt sets
    the (C, E) text matrix and the (B, A, C) similarity are the widest
    tensors; sharding C over 'model' splits the similarity matmul and the
    max/argmax reductions across chips (XLA lowers the max to an
    all-reduce-max over 'model').

Everything is annotation-driven -- no hand-written collectives; the same
step function runs single-chip when the mesh is 1x1.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yoloclip_tpu.config import TrainingConfig
from yoloclip_tpu.train.train_state import TrainState, make_train_step


def make_sharded_train_step(cfg: TrainingConfig, mesh: Mesh):
    """jit the train step with explicit shardings over `mesh`.

    batch arrays: leading dim over 'data'. text_embeddings (B, C, E):
    batch over 'data', classes over 'model'. State: replicated.
    """
    step = make_train_step(cfg)
    repl = NamedSharding(mesh, P())
    data1 = NamedSharding(mesh, P('data'))
    batch_shardings = {
        'images': data1, 'boxes': data1, 'class_ids': data1,
        'valid_mask': data1,
    }
    text_sharding = NamedSharding(mesh, P('data', 'model', None))

    def state_shardings(state: TrainState):
        return jax.tree_util.tree_map(lambda _: repl, state)

    def sharded(state, batch, text):
        return step(state, batch, text)

    def compile_for(state):
        return jax.jit(
            sharded,
            in_shardings=(state_shardings(state), batch_shardings,
                          text_sharding),
            donate_argnums=(0,),
        )

    return compile_for


def make_sharded_inference(model_apply, mesh: Mesh):
    """Batched inference with batch over 'data' and classes over 'model'."""
    data1 = NamedSharding(mesh, P('data'))
    text_sharding = NamedSharding(mesh, P('model', None))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def run(variables, images, text):
        images = jax.lax.with_sharding_constraint(images, data1)
        text = jax.lax.with_sharding_constraint(text, text_sharding)
        return model_apply(variables, images, text)

    return run


def place_batch(batch: Dict, mesh: Mesh) -> Dict:
    data1 = NamedSharding(mesh, P('data'))
    return {k: jax.device_put(jnp.asarray(v), data1) for k, v in batch.items()}


def place_text(text, mesh: Mesh, batched: bool = True):
    spec = P('data', 'model', None) if batched else P('model', None)
    return jax.device_put(jnp.asarray(text), NamedSharding(mesh, spec))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)
