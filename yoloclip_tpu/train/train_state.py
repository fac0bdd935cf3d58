"""Train state + optimizer + jitted train step (single- and multi-chip).

Optimizer contract from `/root/reference/yolo_clip_detector/train.py:170-187`
and `run_train.py:161-177`: AdamW(lr, weight_decay) + OneCycleLR
(max_lr=lr, pct_start=warmup_epochs/max_epochs, div_factor=25,
final_div_factor=1e4, cosine anneal on both phases). The reference steps the
scheduler ONCE PER EPOCH (`train/trainer.py:387-388` -- OneCycleLR is
per-step by design; SURVEY §3.2 quirk). Here the learning rate is an
injected hyperparameter: the trainer builds the reference's step-unit
curve and evaluates it at epoch counts (compat, reproducing the quirk) or
step counts (clean) on the host and writes it into opt_state, so both
cadences share one jitted step.

TPU-first: the whole forward/backward/update is one jitted program; for
multi-chip, params/opt_state are replicated and the batch is sharded over
the mesh's 'data' axis, so XLA inserts the psum gradient all-reduce over ICI
automatically (SURVEY §2.2's replacement for the reference's absent DDP).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from yoloclip_tpu.config import TrainingConfig
from yoloclip_tpu.train.losses import combined_loss_compat


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # EMA of params (None when cfg.ema_decay == 0); updated inside the
    # jitted step, used for eval/serving -- see eval_params below
    ema_params: Any = None
    tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                    default=None)
    apply_fn: Callable = struct.field(pytree_node=False, default=None)

    @property
    def variables(self):
        return {'params': self.params, 'batch_stats': self.batch_stats}

    @property
    def eval_params(self):
        """The weights to evaluate/serve: EMA when tracked, else raw."""
        return self.params if self.ema_params is None else self.ema_params

    @property
    def eval_variables(self):
        return {'params': self.eval_params, 'batch_stats': self.batch_stats}


def _cos_interp(a: float, b: float, t: jax.Array) -> jax.Array:
    """Cosine interpolation from a (t=0) to b (t=1)."""
    return b + (a - b) * (1 + jnp.cos(jnp.pi * t)) / 2


def make_onecycle_schedule(base_lr: float, total_steps: int,
                           warmup_steps: int,
                           div_factor: float = 25.0,
                           final_div_factor: float = 1e4):
    """`torch.optim.lr_scheduler.OneCycleLR` oracle-exact (the reference's
    scheduler, `run_train.py:169-177`: anneal_strategy='cos',
    three_phase=False, pct_start=warmup_steps/total_steps).

    sched(count) == torch's lr after `count` scheduler steps, i.e. the lr
    the optimizer uses for 0-indexed step `count`. Torch's phase boundary
    sits at pct_start*total_steps - 1 == warmup_steps - 1 (lr peaks THERE,
    not at warmup_steps) and the final lr lands exactly on step
    total_steps - 1; counts beyond that clamp to the final lr (torch
    raises instead). Value-compared against torch over full runs in
    tests/test_optim_reference.py."""
    last = float(max(int(total_steps), 1) - 1)
    boundary = float(warmup_steps) - 1.0    # torch: pct_start*total - 1
    init = base_lr / div_factor
    final = init / final_div_factor

    def sched(count):
        count = jnp.clip(jnp.asarray(count, jnp.float32), 0.0, last)
        t_up = count / jnp.maximum(boundary, 1e-12)
        t_dn = (count - boundary) / jnp.maximum(last - boundary, 1e-12)
        return jnp.where(count <= boundary,
                         _cos_interp(init, base_lr, t_up),
                         _cos_interp(base_lr, final, t_dn))

    return sched


def make_optimizer(cfg: TrainingConfig) -> optax.GradientTransformation:
    """AdamW/SGD with an injected (host-settable) learning rate."""
    if cfg.optimizer_type.lower() == 'adamw':
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay)
    if cfg.optimizer_type.lower() == 'sgd':
        return optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg.learning_rate, momentum=0.9)
    raise ValueError(f'Unknown optimizer {cfg.optimizer_type}')


def set_learning_rate(state: TrainState, lr) -> TrainState:
    """Write the injected learning rate (host-side schedule driver)."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp['learning_rate'] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hp))


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams['learning_rate'])


def create_train_state(model, cfg: TrainingConfig, rng: jax.Array,
                       sample_images: jax.Array,
                       sample_text: jax.Array) -> TrainState:
    variables = model.init(rng, sample_images, sample_text, train=False)
    tx = make_optimizer(cfg)
    params = variables['params']
    # real copy, not asarray: the EMA tree must not alias the param
    # buffers (the trainer's jitted step donates the whole state --
    # aliased leaves would be donated twice)
    ema = (jax.tree_util.tree_map(jnp.copy, params)
           if getattr(cfg, 'ema_decay', 0.0) > 0 else None)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(params),
        ema_params=ema,
        tx=tx,
        apply_fn=model.apply,
    )


def make_train_step(cfg: TrainingConfig):
    """Build train_step(state, batch, text_embeddings) -> (state, metrics).

    batch: images (B,H,W,3), boxes (B,M,4), class_ids (B,M),
    valid_mask (B,M). text_embeddings: (B,C,E) per-sample (online mode,
    zero-padded ragged vocabularies -- reference semantics) or (C,E) shared.
    """
    weights = dict(cfg.loss_weights)
    ema_decay = getattr(cfg, 'ema_decay', 0.0)
    ema_warmup = max(float(getattr(cfg, 'ema_warmup_steps', 2000)), 1.0)
    use_clean = cfg.assigner == 'topk_center'
    if use_clean:
        from yoloclip_tpu.train.assign import anchor_points
        anchors, anchor_strides = anchor_points(cfg.model.strides,
                                                cfg.model.image_size)

    def compute_loss(outputs, batch):
        if use_clean:
            from yoloclip_tpu.train.losses import combined_loss_clean
            return combined_loss_clean(
                outputs, batch, weights, anchors, anchor_strides,
                temperature=cfg.temperature, iou_type=cfg.iou_type,
                label_smoothing=cfg.label_smoothing,
                reg_max=cfg.model.reg_max,
                contrastive_type=cfg.contrastive_type)
        return combined_loss_compat(
            outputs, batch, weights, temperature=cfg.temperature,
            iou_type=cfg.iou_type, label_smoothing=cfg.label_smoothing)

    accum = max(int(getattr(cfg, 'grad_accum_steps', 1)), 1)

    def loss_and_grad(state, params, batch_stats, batch, text_embeddings):
        def loss_fn(params):
            outputs, mutated = state.apply_fn(
                {'params': params, 'batch_stats': batch_stats},
                batch['images'], text_embeddings, train=True,
                mutable=['batch_stats'])
            total, parts = compute_loss(outputs, batch)
            return total, (parts, mutated['batch_stats'])

        (_, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return aux, grads

    def accum_loss_and_grad(state, batch, text_embeddings):
        """lax.scan over `accum` equal micro-batches inside the one jitted
        step: activations live for one micro-batch at a time, gradients
        average to the full-batch mean (micro losses are equal-size
        means), batch_stats update sequentially (standard EMA semantics
        -- a k-fold smaller effective BN batch, like torch accumulation).
        """
        B = batch['images'].shape[0]
        if B % accum:
            raise ValueError(f'batch size {B} not divisible by '
                             f'grad_accum_steps {accum}')
        b = B // accum
        micro = {k: v.reshape((accum, b) + v.shape[1:])
                 for k, v in batch.items()}
        per_sample_text = text_embeddings.ndim == 3
        if per_sample_text:
            xs = (micro, text_embeddings.reshape(
                (accum, b) + text_embeddings.shape[1:]))
        else:
            xs = micro

        def body(carry, xs):
            bs, gacc = carry
            mb = xs[0] if per_sample_text else xs
            tx = xs[1] if per_sample_text else text_embeddings
            (parts, new_bs), g = loss_and_grad(state, state.params, bs,
                                               mb, tx)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, g)
            return (new_bs, gacc), parts

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (new_bs, gsum), parts_stack = jax.lax.scan(
            body, (state.batch_stats, zeros), xs)
        grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
        parts = jax.tree_util.tree_map(lambda x: x.mean(0), parts_stack)
        return (parts, new_bs), grads

    def train_step(state: TrainState, batch: Dict, text_embeddings):
        if accum == 1:
            (parts, new_bs), grads = loss_and_grad(
                state, state.params, state.batch_stats, batch,
                text_embeddings)
        else:
            (parts, new_bs), grads = accum_loss_and_grad(
                state, batch, text_embeddings)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay > 0:
            # YOLOv8-style ramped decay: early steps average aggressively
            # (EMA tracks the fast-moving init), converging to ema_decay
            d = ema_decay * (1 - jnp.exp(
                -(state.step + 1).astype(jnp.float32) / ema_warmup))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: (e * d + p.astype(e.dtype) * (1 - d)),
                state.ema_params, new_params)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt,
                                  ema_params=new_ema)
        return new_state, parts

    return train_step


def make_eval_step(cfg: TrainingConfig):
    """eval_step(state, batch, text) -> (metrics, outputs-for-mAP).

    Mirrors `trainer.py:257-309`: losses without the dfl term, plus raw
    top-max_objects predictions for the evaluator (no NMS -- reference
    behavior). With cfg.eval_with_nms the predictions are instead real
    detections (conf filter + class-agnostic NMS; invalid slots get
    class_id -1, which the evaluator never matches)."""
    weights = dict(cfg.loss_weights)
    M = cfg.max_objects

    def eval_step(state: TrainState, batch: Dict, text_embeddings):
        # eval_variables: EMA weights when cfg.ema_decay > 0, else raw
        outputs = state.apply_fn(
            state.eval_variables,
            batch['images'], text_embeddings, train=False)
        total, parts = combined_loss_compat(
            outputs, batch, weights, temperature=cfg.temperature,
            iou_type=cfg.iou_type, label_smoothing=cfg.label_smoothing)
        parts = {k: v for k, v in parts.items() if k != 'dfl_loss'}
        if cfg.eval_with_nms:
            from yoloclip_tpu.ops.nms import batched_nms
            det = batched_nms(outputs['boxes'], outputs['scores'],
                              outputs['class_ids'],
                              cfg.eval_conf_threshold,
                              cfg.eval_iou_threshold,
                              topk=min(1024, outputs['scores'].shape[1]),
                              max_detections=M)
            preds = {'boxes': det['boxes'], 'scores': det['scores'],
                     'class_ids': det['class_ids']}
        else:
            preds = {
                'boxes': outputs['boxes'][:, :M],
                'scores': outputs['scores'][:, :M],
                'class_ids': outputs['class_ids'][:, :M],
            }
        return parts, preds

    return eval_step
