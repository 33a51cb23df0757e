"""Training recipe for the on-device face detector (models/facedet.py).

Anchor assignment on the host (IoU-nearest with a floor, plus best-anchor
fallback per box), jitted step with sigmoid-focal score loss + Huber box
regression on positives. Dataset: an iterator of (image uint8 [128,128,3],
boxes [[cy,cx,h,w] in 0..1]) — e.g. from WIDER-FACE-style annotations via
tools/train_facedet.py.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genconvit_tpu.models.facedet import anchor_centers, facedet_apply, init_facedet

_ANCHOR_SIZE = 0.2  # base box scale used by the decode (facedet_apply)


def assign_targets(boxes: Sequence[Sequence[float]]
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """boxes [[cy,cx,h,w]] -> (labels [A] in {0,1}, regression [A,4]).

    Size-aware: small boxes match the fine 16x16 anchor grid, large boxes
    the coarse 8x8 grid (matching anchor granularity to box scale lifted
    held-out IoU substantially vs scale-blind nearest-anchor assignment).
    Regression targets invert the decode: dy/dx = (c - anchor_c) / 0.1,
    dh/dw = log(size / 0.2)."""
    from genconvit_tpu.models.facedet import _ANCHORS_16

    centers = anchor_centers()
    a = len(centers)
    n16 = 16 * 16 * _ANCHORS_16
    labels = np.zeros((a,), np.float32)
    reg = np.zeros((a, 4), np.float32)
    for (cy, cx, h, w) in boxes:
        d2 = (centers[:, 0] - cy) ** 2 + (centers[:, 1] - cx) ** 2
        if max(h, w) <= 0.4:  # fine grid for small faces
            near = np.argsort(d2[:n16])[:3]
        else:  # coarse grid for large faces
            near = n16 + np.argsort(d2[n16:])[:3]
        near = np.concatenate([near, [int(np.argmin(d2))]])
        labels[near] = 1.0
        reg[near, 0] = (cy - centers[near, 0]) / 0.1
        reg[near, 1] = (cx - centers[near, 1]) / 0.1
        reg[near, 2] = np.log(max(h, 1e-3) / _ANCHOR_SIZE)
        reg[near, 3] = np.log(max(w, 1e-3) / _ANCHOR_SIZE)
    return labels, reg


def make_facedet_train_step(tx: optax.GradientTransformation,
                            focal_gamma: float = 2.0, box_weight: float = 1.0):
    def loss_fn(params, images_u8, labels, reg_targets):
        x = images_u8.astype(jnp.float32) / 127.5 - 1.0
        scores, boxes = facedet_apply(params, x)
        # invert decode to raw offsets for the regression loss
        centers = jnp.asarray(anchor_centers())
        raw = jnp.stack([
            (boxes[..., 0] - centers[:, 0]) / 0.1,
            (boxes[..., 1] - centers[:, 1]) / 0.1,
            jnp.log(boxes[..., 2] / _ANCHOR_SIZE),
            jnp.log(boxes[..., 3] / _ANCHOR_SIZE),
        ], axis=-1)
        p = jax.nn.sigmoid(scores)
        pt = jnp.where(labels > 0.5, p, 1.0 - p)
        bce = -jnp.log(jnp.clip(pt, 1e-7))
        focal = ((1.0 - pt) ** focal_gamma * bce).mean()
        huber = optax.huber_loss(raw, reg_targets).sum(-1)
        pos = labels > 0.5
        box_loss = jnp.sum(huber * pos) / jnp.maximum(jnp.sum(pos), 1.0)
        loss = focal + box_weight * box_loss
        return loss, {"focal": focal, "box": box_loss}

    def step(params, opt_state, images, labels, reg):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, labels, reg)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return jax.jit(step)


def train_facedet(
    dataset: Iterable[Tuple[np.ndarray, List[List[float]]]],
    *, epochs: int = 10, batch_size: int = 32, lr: float = 1e-3,
    seed: int = 0, params: Dict = None, log_every: int = 20,
    cosine_decay_steps: int = 0,
) -> Dict:
    """Returns trained params. `dataset` is re-iterated per epoch.
    cosine_decay_steps > 0 enables a cosine lr schedule over that many
    optimizer steps (long synthetic-data runs underfit at constant lr)."""
    import logging

    log = logging.getLogger("genconvit_tpu")
    params = params or init_facedet(jax.random.PRNGKey(seed))
    sched = (optax.cosine_decay_schedule(lr, cosine_decay_steps, alpha=0.01)
             if cosine_decay_steps else lr)
    tx = optax.adam(sched)
    opt_state = tx.init(params)
    step = make_facedet_train_step(tx)
    for epoch in range(epochs):
        imgs_buf, lab_buf, reg_buf = [], [], []
        losses = []
        for img, boxes in dataset:
            labels, reg = assign_targets(boxes)
            imgs_buf.append(img)
            lab_buf.append(labels)
            reg_buf.append(reg)
            if len(imgs_buf) == batch_size:
                params, opt_state, loss, _ = step(
                    params, opt_state, jnp.asarray(np.stack(imgs_buf)),
                    jnp.asarray(np.stack(lab_buf)), jnp.asarray(np.stack(reg_buf)))
                losses.append(float(loss))
                imgs_buf, lab_buf, reg_buf = [], [], []
                if len(losses) % log_every == 0:
                    log.info("facedet epoch %d step %d loss %.4f",
                             epoch, len(losses), losses[-1])
        if losses:
            log.info("facedet epoch %d mean loss %.4f", epoch,
                     float(np.mean(losses)))
    return params
