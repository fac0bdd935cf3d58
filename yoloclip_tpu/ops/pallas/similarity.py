"""Pallas TPU kernel: fused region-text similarity + max/argmax.

The open-vocabulary scoring step is
    sim = normalize(obj) @ normalize(text)^T      # (A, C)
    scores, class_ids = sim.max(-1), sim.argmax(-1)
(ref `model/heads/text_contrastive.py:119-153` + `model/yolo_clip.py:
194-214`). At LVIS scale (C=1203) the intermediate is the widest tensor in
the whole model: bs=32 x 8400 x 1203 fp32 = 1.3 GB of HBM traffic that the
detector immediately reduces away.

This kernel streams text tiles through VMEM and keeps a running max/argmax
per region tile, so the (A, C) intermediate never exists: per grid step it
does one (TILE_A, E) x (E, TILE_C) MXU matmul and a VPU running-max update.
HBM traffic drops from O(A*C) to O(A*E + C*E + A).

The class dimension is padded to the tile size with -inf masking, so padded
vocabulary rows can never win the argmax (strictly better than the
reference's zero-row padding; pass a `num_valid` smaller than C to also
mask real rows).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python float: jnp scalars would be captured consts in pallas


def _kernel(nvalid_ref, obj_ref, text_ref, max_ref, arg_ref, acc_max, acc_arg,
            *, normalize_obj: bool):
    """Grid: (B, A_tiles, C_tiles). C is the minor (fastest) grid dim, so
    the running max in VMEM scratch accumulates across C tiles for one
    (batch, A tile) before the outputs are written.

    normalize_obj: obj rows arrive UNNORMALIZED; a positive per-row scale
    cannot change the argmax over classes, so the running max/argmax run on
    raw dot products and only the final max is divided by the row norm
    (computed from the VMEM-resident obj tile). This keeps the large
    (B, A, E) embedding tensor out of a separate fp32 normalize pass in HBM
    (~2.7 GB per bs=32 batch: cast + reduce + divide + cast-back)."""
    ci = pl.program_id(2)
    nc = pl.num_programs(2)
    tile_c = text_ref.shape[1]

    @pl.when(ci == 0)
    def _init():
        acc_max[:] = jnp.full_like(acc_max, NEG)
        acc_arg[:] = jnp.zeros_like(acc_arg)

    # (TILE_A, E) @ (E, TILE_C) on the MXU
    scores = jax.lax.dot_general(
        obj_ref[0], text_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TILE_A, TILE_C)

    # mask class columns beyond the valid vocabulary
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + ci * tile_c
    scores = jnp.where(col < nvalid_ref[0], scores, NEG)

    tile_max = jnp.max(scores, axis=1)
    tile_arg = jnp.argmax(scores, axis=1).astype(jnp.int32) + ci * tile_c

    better = tile_max > acc_max[:, 0]
    acc_max[:, 0] = jnp.where(better, tile_max, acc_max[:, 0])
    acc_arg[:, 0] = jnp.where(better, tile_arg, acc_arg[:, 0])

    @pl.when(ci == nc - 1)
    def _write():
        if normalize_obj:
            o = obj_ref[0].astype(jnp.float32)
            norm = jnp.sqrt(jnp.sum(o * o, axis=1, keepdims=True))
            max_ref[0] = acc_max[:] / jnp.maximum(norm, 1e-12)
        else:
            max_ref[0] = acc_max[:]
        arg_ref[0] = acc_arg[:]


def _pad_to(x: jax.Array, size: int, axis: int, value=0.0) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _pick_tile_c(tile_c: Optional[int], C: int) -> int:
    """Class-tile policy, measured on v5e (benchmarks/probe_lvis_fold.py):
    the C-tile streaming loop costs ~1 us/grid-step of overhead, and at
    LVIS scale (C=1203, 5 tiles of 256) that loop was ~10% of the WHOLE
    serve pipeline. A single C tile collapses the running-max loop
    entirely (1662 vs 1509 img/s e2e); stream only when the padded class
    dim would blow the VMEM budget. Explicit tile_c is honored (clamped
    to the padded C so tiny vocabularies never pad to dead columns)."""
    cp = max(128, -(-C // 128) * 128)
    if tile_c is None:
        return cp if cp <= 2048 else 512
    return min(tile_c, cp)


@functools.partial(jax.jit,
                   static_argnames=('tile_a', 'tile_c', 'interpret',
                                    'normalize_obj'))
def fused_similarity_argmax(obj: jax.Array, text: jax.Array,
                            num_valid: Optional[jax.Array] = None,
                            tile_a: int = 512,
                            tile_c: Optional[int] = None,
                            interpret: Optional[bool] = None,
                            normalize_obj: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """obj (A, E) or (B, A, E), text (C, E) or (B, C, E) L2-normalized
    -> (scores, class_ids) of shape (A,) / (B, A) without materializing
    the (..., A, C) similarity tensor.

    obj must be pre-normalized UNLESS normalize_obj=True, in which case
    raw region embeddings are accepted and L2-normalized inside the kernel
    (per-row scale folding at write time -- saves the fp32 normalize
    round-trip of the big embedding tensor through HBM; argmax is
    invariant to positive row scaling so results are identical).

    Batched text is REQUIRED when text embeddings differ per image (e.g.
    after I-Pooling attention); a shared (C, E) matrix with batched obj is
    broadcast. num_valid: optional scalar int; classes >= num_valid are
    masked. interpret: None = auto (interpreter off-TPU so the kernel runs
    anywhere).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    squeeze = obj.ndim == 2
    if squeeze:
        obj = obj[None]
    B, A, E = obj.shape
    if text.ndim == 2:
        text = jnp.broadcast_to(text[None], (B,) + text.shape)
    C = text.shape[1]
    tile_c = _pick_tile_c(tile_c, C)
    Ap = -(-A // tile_a) * tile_a
    Cp = -(-C // tile_c) * tile_c
    # keep the input dtype (bf16 halves HBM traffic and doubles MXU rate;
    # the dot still accumulates fp32 via preferred_element_type)
    obj_p = _pad_to(obj, Ap, 1)
    text_p = _pad_to(text, Cp, 1)
    nvalid = jnp.asarray(
        [C if num_valid is None else num_valid], jnp.int32)

    grid = (B, Ap // tile_a, Cp // tile_c)
    out_max, out_arg = pl.pallas_call(
        functools.partial(_kernel, normalize_obj=normalize_obj),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile_a, E), lambda b, a, c, nv: (b, a, 0)),
                pl.BlockSpec((1, tile_c, E), lambda b, a, c, nv: (b, c, 0)),
            ],
            out_specs=[
                # trailing dim of 1: 1-D outputs trip XLA-vs-Mosaic
                # tiled-layout mismatches on real TPUs
                pl.BlockSpec((1, tile_a, 1), lambda b, a, c, nv: (b, a, 0)),
                pl.BlockSpec((1, tile_a, 1), lambda b, a, c, nv: (b, a, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_a, 1), jnp.float32),
                pltpu.VMEM((tile_a, 1), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Ap, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, Ap, 1), jnp.int32),
        ],
        interpret=interpret,
    )(nvalid, obj_p, text_p)
    scores, ids = out_max[:, :A, 0], out_arg[:, :A, 0]
    if squeeze:
        return scores[0], ids[0]
    return scores, ids


def _folded_kernel(nvalid_ref, h_ref, tp_ref, cb_ref, k_ref, b_ref,
                   max_ref, arg_ref, acc_max, acc_arg):
    """Projection-folded variant: the head's final 1x1 projection
    obj = h @ K + b (K: (hidden, E)) is algebraically moved to the TEXT
    side, so the (A, E) obj tensor never exists in HBM:

        obj . t_c = h . (K t_c) + b . t_c   =>  raw = h @ tp^T + cb
        ||obj||   = ||h K + b||             (computed in-VMEM at write time)

    Inputs per grid step: h tile (TILE_A, hidden) RAW hidden activations,
    tp tile (TILE_C, hidden) = text @ K^T, cb tile (TILE_C, 1) = text @ b,
    k (hidden, E) and b (1, E) full (for the row-norm at write time).
    Saves the head's E-wide projection conv, its (B, A, E) HBM round trip
    and the level concat; the class matmul contracts over `hidden` (256)
    instead of E (512)."""
    ci = pl.program_id(2)
    nc = pl.num_programs(2)
    tile_c = tp_ref.shape[1]

    @pl.when(ci == 0)
    def _init():
        acc_max[:] = jnp.full_like(acc_max, NEG)
        acc_arg[:] = jnp.zeros_like(acc_arg)

    scores = jax.lax.dot_general(
        h_ref[0], tp_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TILE_A, TILE_C)
    scores = scores + cb_ref[0][:, 0][None, :]

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + ci * tile_c
    scores = jnp.where(col < nvalid_ref[0], scores, NEG)

    tile_max = jnp.max(scores, axis=1)
    tile_arg = jnp.argmax(scores, axis=1).astype(jnp.int32) + ci * tile_c

    better = tile_max > acc_max[:, 0]
    acc_max[:, 0] = jnp.where(better, tile_max, acc_max[:, 0])
    acc_arg[:, 0] = jnp.where(better, tile_arg, acc_arg[:, 0])

    @pl.when(ci == nc - 1)
    def _write():
        # row norm of the NEVER-MATERIALIZED obj = h @ K + b, fp32-accum
        g = jax.lax.dot_general(
            h_ref[0], k_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (TILE_A, E)
        obj_f = g + b_ref[...]
        norm = jnp.sqrt(jnp.sum(obj_f * obj_f, axis=1, keepdims=True))
        max_ref[0] = acc_max[:] / jnp.maximum(norm, 1e-12)
        arg_ref[0] = acc_arg[:]


@functools.partial(jax.jit,
                   static_argnames=('tile_a', 'tile_c', 'interpret'))
def fused_projected_similarity_argmax(h: jax.Array, text: jax.Array,
                                      kernel: jax.Array, bias: jax.Array,
                                      num_valid: Optional[jax.Array] = None,
                                      tile_a: int = 512,
                                      tile_c: Optional[int] = None,
                                      interpret: Optional[bool] = None
                                      ) -> Tuple[jax.Array, jax.Array]:
    """Cosine max/argmax of `normalize(h @ kernel + bias) @ normalize(text)^T`
    WITHOUT materializing the projected (B, A, E) obj embeddings OR the
    (B, A, C) similarity tensor.

    h: (A, K) or (B, A, K) raw hidden activations (pre-projection);
    kernel: (K, E), bias: (E,) — the head's 1x1 projection params (fp32);
    text: (C, E) or (B, C, E), must be L2-NORMALIZED.
    Returns (scores, class_ids) shaped like `fused_similarity_argmax`.

    The projection is folded into the text side (text_proj = text @ K^T,
    class_bias = text @ b, both tiny) and the obj row norm is computed
    inside the kernel from the VMEM-resident h tile. Algebraically
    identical to projecting then scoring; floating-point differs by
    rounding order only (the compute-dtype rounding of `obj` is replaced
    by the compute-dtype rounding of `text_proj`).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    squeeze = h.ndim == 2
    if squeeze:
        h = h[None]
    B, A, K = h.shape
    if text.ndim == 2:
        text = jnp.broadcast_to(text[None], (B,) + text.shape)
    C = text.shape[1]
    tile_c = _pick_tile_c(tile_c, C)
    E = kernel.shape[1]
    dt = h.dtype
    k32 = kernel.astype(jnp.float32)
    b32 = bias.astype(jnp.float32)
    # prep in COMPUTE dtype (fp32 accumulation): an fp32 matmul here runs
    # as multi-pass bf16 on the MXU -- at LVIS scale (C=1203, x3 levels)
    # that alone cost ~7% e2e. The old unfolded path cast text to the
    # compute dtype before its kernel anyway; same rounding class.
    text_proj = jnp.einsum('bce,ke->bck', text.astype(dt), k32.astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
    cls_bias = jnp.einsum('bce,e->bc', text.astype(jnp.float32), b32,
                          preferred_element_type=jnp.float32)[..., None]

    Ap = -(-A // tile_a) * tile_a
    Cp = -(-C // tile_c) * tile_c
    h_p = _pad_to(h, Ap, 1)
    tp_p = _pad_to(text_proj, Cp, 1)
    cb_p = _pad_to(cls_bias, Cp, 1)
    nvalid = jnp.asarray(
        [C if num_valid is None else num_valid], jnp.int32)

    grid = (B, Ap // tile_a, Cp // tile_c)
    out_max, out_arg = pl.pallas_call(
        _folded_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile_a, K), lambda b, a, c, nv: (b, a, 0)),
                pl.BlockSpec((1, tile_c, K), lambda b, a, c, nv: (b, c, 0)),
                pl.BlockSpec((1, tile_c, 1), lambda b, a, c, nv: (b, c, 0)),
                pl.BlockSpec((K, E), lambda b, a, c, nv: (0, 0)),
                pl.BlockSpec((1, E), lambda b, a, c, nv: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_a, 1), lambda b, a, c, nv: (b, a, 0)),
                pl.BlockSpec((1, tile_a, 1), lambda b, a, c, nv: (b, a, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_a, 1), jnp.float32),
                pltpu.VMEM((tile_a, 1), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Ap, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, Ap, 1), jnp.int32),
        ],
        interpret=interpret,
    )(nvalid, h_p, tp_p, cb_p, k32.astype(dt), b32[None])
    scores, ids = out_max[:, :A, 0], out_arg[:, :A, 0]
    if squeeze:
        return scores[0], ids[0]
    return scores, ids


def similarity_argmax_reference(obj: jax.Array, text: jax.Array,
                                num_valid: Optional[jax.Array] = None
                                ) -> Tuple[jax.Array, jax.Array]:
    """Plain-XLA equivalent (materializes (A, C)); used as the fallback on
    non-TPU backends and as the test oracle."""
    sim = obj.astype(jnp.float32) @ text.astype(jnp.float32).T
    if num_valid is not None:
        col = jnp.arange(sim.shape[1])[None, :]
        sim = jnp.where(col < num_valid, sim, NEG)
    return jnp.max(sim, axis=1), jnp.argmax(sim, axis=1).astype(jnp.int32)
