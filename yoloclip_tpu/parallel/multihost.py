"""Multi-host (pod-scale) training: one JAX process per host, one global
('data', 'model') mesh over every chip in the pod.

The reference has no distributed support at all (SURVEY §2.2); this is
the TPU-native pod story built on jax.distributed + GSPMD:

  * `initialize()` wraps jax.distributed.initialize. On a real TPU pod
    slice the coordinator/process topology auto-detects from the TPU
    metadata (call it with no arguments); for manual/CPU bring-up pass
    coordinator_address/num_processes/process_id explicitly.
  * After initialize, `jax.devices()` is GLOBAL -- parallel/mesh.py's
    create_mesh() builds the pod-wide mesh unchanged, and
    make_sharded_train_step runs on it unchanged: GSPMD collectives
    (grad psum, vocab-TP all-reduce-max) ride ICI within a host and DCN
    across hosts exactly as laid out by the mesh axes.
  * The only genuinely multi-host concern is DATA: each host loads its
    own slice (`process_local_indices`, `local_batch_size`) and
    assembles globally-sharded arrays from process-local shards
    (`make_global_batch` / `make_global_text`, thin wrappers over
    jax.make_array_from_process_local_data).

Self-test (2 CPU processes x 4 virtual devices, one global 8-device
mesh; used by tests/test_multihost.py):

    python -m yoloclip_tpu.parallel.multihost --selftest \
        --process-id 0 --num-processes 2 &
    python -m yoloclip_tpu.parallel.multihost --selftest \
        --process-id 1 --num-processes 2
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yoloclip_tpu.parallel.mesh import batch_sharding


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None, **kwargs) -> None:
    """jax.distributed.initialize, idempotent.

    On a real TPU pod slice call with NO arguments (topology
    auto-detects). Must run before any other JAX call in the process
    (even jax.devices()) -- which is also why this guard must NOT probe
    the backend: jax.process_count() would initialize it.
    """
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def local_batch_size(global_batch_size: int,
                     process_count: Optional[int] = None) -> int:
    """Per-host slice of the GLOBAL batch (cfg.batch_size is global)."""
    n = jax.process_count() if process_count is None else process_count
    if global_batch_size % n:
        raise ValueError(f'global batch size {global_batch_size} not '
                         f'divisible by process count {n}')
    return global_batch_size // n


def process_local_indices(n_items: int,
                          process_index: Optional[int] = None,
                          process_count: Optional[int] = None,
                          even: bool = False) -> List[int]:
    """This host's strided slice of dataset indices [pid, pid+P, ...].

    Strided (not contiguous) so per-class ordering in the source
    annotation file spreads evenly across hosts. Build each host's
    DataLoader over `dataset subset[these indices]` with
    batch_size=local_batch_size(cfg.batch_size).

    even=True truncates every host to n_items // P entries so all hosts
    see the SAME number of batches -- required in the trainer, whose
    per-batch collectives deadlock on unequal step counts.
    """
    pid = (jax.process_index() if process_index is None else process_index)
    n = (jax.process_count() if process_count is None else process_count)
    idx = list(range(pid, n_items, n))
    if even:
        idx = idx[:n_items // n]
    return idx


class Subset:
    """Index-remapped view over a dataset (for per-host shards)."""

    def __init__(self, dataset, indices: List[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[self.indices[i]]


def make_global_batch(local_batch: Dict, mesh: Mesh) -> Dict:
    """Process-local batch arrays (b_local leading dim) -> global jax
    Arrays with the batch axis sharded over 'data' across the pod."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in local_batch.items():
        if hasattr(v, 'shape') and getattr(v, 'ndim', 0) >= 1:
            out[k] = jax.make_array_from_process_local_data(
                sh, np.asarray(v))
        else:
            out[k] = v
    return out


def make_global_text(local_text, mesh: Mesh, batched: bool = True):
    """Per-host text embeddings -> global array with the shardings the
    sharded train/inference steps expect.

    batched=True: (b_local, C, E) per host -> (B, C, E) global, batch
    over 'data', classes over 'model' (each host passes FULL C; its
    local devices hold every 'model' shard of its own batch rows).
    batched=False: the SAME (C, E) matrix on every host -> classes over
    'model'.
    """
    local_text = np.asarray(local_text)
    spec = P('data', 'model', None) if batched else P('model', None)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_text)


# ---------------------------------------------------------------------------
# self-test: one sharded train step on a 2-process global mesh
# ---------------------------------------------------------------------------

def _selftest_loss(num_processes: int = 1,
                   process_id: Optional[int] = None,
                   coordinator: str = '127.0.0.1:19733',
                   ckpt_dir: Optional[str] = None) -> float:
    """Deterministic one-step loss on an 8-device ('data'=4, 'model'=2)
    mesh. Run under 1 process x 8 devices OR 2 processes x 4 devices:
    the GSPMD program is identical, so the loss must agree (up to
    collective reduction order) -- that agreement is the test."""
    if num_processes > 1:
        initialize(coordinator_address=coordinator,
                   num_processes=num_processes, process_id=process_id)

    import jax.numpy as jnp

    from yoloclip_tpu.utils.general import enable_compile_cache
    enable_compile_cache()   # reruns skip the ~3 min sharded-step compile

    from yoloclip_tpu.config import ModelConfig, TrainingConfig
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP
    from yoloclip_tpu.parallel.mesh import create_mesh
    from yoloclip_tpu.parallel.train_step import (make_sharded_train_step,
                                                  replicate_state)
    from yoloclip_tpu.train.train_state import create_train_state

    B, C, M, S = 8, 8, 6, 64
    mcfg = ModelConfig(backbone_variant='n', image_size=(S, S))
    cfg = TrainingConfig(model=mcfg, max_objects=M, batch_size=B)
    model = YOLOCLIP(mcfg)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        jnp.zeros((1, S, S, 3)), jnp.zeros((C, 512)))

    npr = np.random.RandomState(0)   # FULL global batch on every host
    images = npr.rand(B, S, S, 3).astype(np.float32)
    boxes = (npr.rand(B, M, 4) * 40).astype(np.float32)
    cids = npr.randint(0, C, (B, M)).astype(np.int32)
    text = npr.randn(B, C, 512).astype(np.float32)

    mesh = create_mesh(n_data=4, n_model=2)
    lo = jax.process_index() * (B // jax.process_count())
    hi = lo + B // jax.process_count()
    with mesh:
        state = replicate_state(state, mesh)
        step = make_sharded_train_step(cfg, mesh)(state)
        batch = make_global_batch({
            'images': images[lo:hi], 'boxes': boxes[lo:hi],
            'class_ids': cids[lo:hi],
            'valid_mask': np.ones((hi - lo, M), bool)}, mesh)
        gtext = make_global_text(text[lo:hi], mesh, batched=True)
        # Compile EXPLICITLY, then line the processes up at a
        # coordination-service barrier before the first execution: the
        # cross-process gloo context initializes at first collective with
        # a hard 30 s deadline, and per-process compile/trace skew on a
        # contended host (or a one-sided persistent-cache hit) can exceed
        # it -- observed as "Gloo context initialization failed:
        # DEADLINE_EXCEEDED" exactly when the compile cache first warmed.
        compiled = step.lower(state, batch, gtext).compile()
        if jax.process_count() > 1:
            from jax._src import distributed
            client = distributed.global_state.client
            if client is not None:
                client.wait_at_barrier('selftest_post_compile', 600_000)
        new_state, parts = compiled(state, batch, gtext)
        loss = float(parts['loss'])

        if ckpt_dir:
            # coordinated checkpoint round-trip: every process calls
            # save/load on the SAME directory (a shared filesystem on a
            # real pod); orbax barriers through the jax.distributed client
            from yoloclip_tpu.utils.checkpoint import (load_checkpoint,
                                                       save_checkpoint)
            save_checkpoint(ckpt_dir, dict(new_state.variables),
                            step=int(new_state.step))
            restored = load_checkpoint(ckpt_dir)
            a = jax.tree_util.tree_leaves(restored['variables'])[0]
            assert np.isfinite(np.asarray(a)).all()

    if ckpt_dir:
        # ...and the full TRAINER loop on the pod mesh: host-local batches
        # assembled globally inside train_epoch/evaluate, global mAP
        # identical on every host, coordinated best/final saves
        _selftest_trainer(mesh, ckpt_dir, images, boxes, cids, B, C, M)
    return loss


class _StubTextEncoder:
    """Deterministic per-prompt embeddings (identical on every host)."""

    def __call__(self, prompts):
        import zlib
        out = np.zeros((len(prompts), 512), np.float32)
        for i, p in enumerate(prompts):
            rs = np.random.RandomState(zlib.crc32(p.encode()) % (2 ** 31))
            v = rs.randn(512).astype(np.float32)
            out[i] = v / np.linalg.norm(v)
        return out


def _selftest_trainer(mesh, out_dir, images, boxes, cids, B, C, M):
    import glob
    import os

    from yoloclip_tpu.config import ModelConfig, TrainingConfig
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP
    from yoloclip_tpu.train.trainer import YOLOCLIPTrainer

    S = images.shape[1]
    names = tuple(f'class_{i}' for i in range(C))
    cfg = TrainingConfig(model=ModelConfig(backbone_variant='n',
                                           image_size=(S, S)),
                         class_names=names, max_objects=M, batch_size=B,
                         max_epochs=1, eval_interval=1, save_interval=10,
                         output_dir=os.path.join(out_dir, 'trainer'))
    lo = jax.process_index() * local_batch_size(B)
    hi = lo + local_batch_size(B)
    local = {'images': images[lo:hi], 'boxes': boxes[lo:hi],
             'class_ids': cids[lo:hi],
             'valid_mask': np.ones((hi - lo, M), bool),
             'text_prompts': [list(names)] * (hi - lo)}
    trainer = YOLOCLIPTrainer(YOLOCLIP(cfg.model), _StubTextEncoder(),
                              cfg, mesh=mesh)
    history = trainer.train([local], [local])
    assert np.isfinite(history['train_loss'][0])
    assert len(history['val_mAP50']) == 1
    finals = glob.glob(os.path.join(cfg.output_dir, 'final_model', '*'))
    assert finals, f'no final checkpoint under {cfg.output_dir}'
    print(f'MULTIHOST_TRAINER pid={jax.process_index()} '
          f'train_loss={history["train_loss"][0]:.6f} '
          f'mAP50={history["val_mAP50"][0]:.6f}', flush=True)


def _main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--selftest', action='store_true')
    ap.add_argument('--num-processes', type=int, default=1)
    ap.add_argument('--process-id', type=int, default=None)
    ap.add_argument('--coordinator', default='127.0.0.1:19733')
    ap.add_argument('--ckpt-dir', default=None,
                    help='shared directory for the coordinated '
                         'checkpoint round-trip (skipped when absent)')
    args = ap.parse_args()
    if not args.selftest:
        ap.error('only --selftest is supported')
    loss = _selftest_loss(args.num_processes, args.process_id,
                          args.coordinator, args.ckpt_dir)
    print(f'MULTIHOST_SELFTEST pid={jax.process_index()} '
          f'procs={jax.process_count()} loss={loss:.6f}', flush=True)


if __name__ == '__main__':
    _main()
