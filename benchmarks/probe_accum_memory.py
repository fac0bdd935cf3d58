"""Gradient-accumulation memory probe (compile-only, real TPU).

Quantifies the claim behind `TrainingConfig.grad_accum_steps`: scanning K
micro-batches inside the one jitted step cuts ACTIVATION memory ~K-fold
while the optimizer sees the full-batch mean gradient. Measured from the
compiler, not the pool: `compiled.memory_analysis()` reports the exact
temp/argument/output HBM allocation XLA reserved for the program, so the
number is deterministic and needs no device execution.

Also prints step wall time per config (async-dispatch, one sync fetch) so
the memory/speed tradeoff is visible in one table; pass --no-time to skip
execution (e.g. while the chip is busy).

Usage:  JAX_PLATFORMS='' python -u benchmarks/probe_accum_memory.py \
            [--batch 128] [--accum 1,2,4] [--size 640] [--no-time]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from yoloclip_tpu.utils.general import enable_compile_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--accum', default='1,2,4',
                    help='comma list of grad_accum_steps values to compare')
    ap.add_argument('--size', type=int, default=640)
    ap.add_argument('--classes', type=int, default=80)
    ap.add_argument('--max-objects', type=int, default=100)
    ap.add_argument('--variant', default='n')
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--no-time', action='store_true',
                    help='compile-only: report memory, skip execution')
    args = ap.parse_args()

    enable_compile_cache()
    from yoloclip_tpu.config import ModelConfig, TrainingConfig
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP
    from yoloclip_tpu.train.train_state import (create_train_state,
                                                make_train_step)

    S = args.size
    B = args.batch
    mcfg = ModelConfig(backbone_variant=args.variant, image_size=(S, S),
                       dtype='bfloat16')
    rng = jax.random.PRNGKey(0)
    npr = np.random.RandomState(0)
    batch = {
        'images': jnp.asarray(npr.rand(B, S, S, 3), jnp.float32),
        'boxes': jnp.asarray(npr.rand(B, args.max_objects, 4) * S,
                             jnp.float32),
        'class_ids': jnp.asarray(
            npr.randint(0, args.classes, (B, args.max_objects)), jnp.int32),
        'valid_mask': jnp.ones((B, args.max_objects), bool),
    }
    text = jax.random.normal(rng, (args.classes, 512), jnp.float32)

    rows = []
    for k in [int(x) for x in args.accum.split(',')]:
        cfg = TrainingConfig(model=mcfg, batch_size=B,
                             max_objects=args.max_objects,
                             grad_accum_steps=k)
        model = YOLOCLIP(mcfg)
        state = create_train_state(model, cfg, rng,
                                   jnp.zeros((1, S, S, 3)),
                                   jnp.zeros((args.classes, 512)))
        step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
        compiled = step.lower(state, batch, text).compile()
        ma = compiled.memory_analysis()
        temp = float(getattr(ma, 'temp_size_in_bytes', 0.0))
        argb = float(getattr(ma, 'argument_size_in_bytes', 0.0))
        outb = float(getattr(ma, 'output_size_in_bytes', 0.0))
        ms = float('nan')
        if not args.no_time:
            s = state
            for _ in range(2):
                s, parts = step(s, batch, text)
            np.asarray(s.step)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s, parts = step(s, batch, text)
            np.asarray(s.step)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
        rows.append((k, temp, argb, outb, ms))
        line = (f'accum={k}: temp {temp/1e9:6.2f} GB  '
                f'args {argb/1e9:5.2f} GB  out {outb/1e9:5.2f} GB')
        if ms == ms:   # not NaN
            line += f'  step {ms:7.1f} ms  ({B/ms*1e3:6.0f} img/s)'
        print(line, flush=True)

    base = rows[0][1]
    for k, temp, *_ in rows[1:]:
        print(f'accum={k} temp memory vs accum={rows[0][0]}: '
              f'{temp/base:.2f}x')


if __name__ == '__main__':
    main()
