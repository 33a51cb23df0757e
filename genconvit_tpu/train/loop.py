"""Training loops for the ED and VAE branches (+ joint ensemble extension).

Loss semantics from the reference:
  ED : CrossEntropy(logits, targets)                       (ref train/train_ed.py:22-23)
  VAE: CE + MSE(recon, images); KL term available but OFF by default
       (commented out in the reference — ref train/train_vae.py:23-25)
Optimizer torch-Adam-equivalent + StepLR(15, 0.1) per epoch (ref train.py:50-59).

The jitted train step is data-parallel-ready: batch arrays can be sharded over
a mesh 'data' axis and XLA inserts the gradient psum (see parallel/mesh.py).
"""

from __future__ import annotations

import logging
import os
import pickle
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genconvit_tpu.config import Config
from genconvit_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from genconvit_tpu.data.folder import load_data
from genconvit_tpu.data.preprocess import normalize_batch
from genconvit_tpu.models.genconvit import genconvit_apply, init_genconvit
from genconvit_tpu.train.optim import make_optimizer, set_lr, step_lr

log = logging.getLogger("genconvit_tpu")


def make_loss_fn(net: str, use_kl: bool = False, dtype=jnp.float32,
                 remat: bool = True, plan=None):
    """remat: rematerialize the forward in the backward pass (jax.checkpoint)
    — trades ~1/3 extra FLOPs for activation memory, which keeps 224x224
    batch-32 ensemble training inside a single chip's HBM.
    plan: KernelPlan resolved at construction (env-fed default); traced code
    never reads os.environ."""
    from genconvit_tpu.ops.kernel_plan import KernelPlan, plan_scope

    plan = plan or KernelPlan.from_env()

    def fwd(params, x, rng):
        # Pallas forward kernels are differentiable via custom VJPs
        # (models/convnext._block_pallas_op), so training keeps them.
        with plan_scope(plan):
            return genconvit_apply(params, x, net=net, rng=rng,
                                   sample=True, train=True)

    apply = jax.checkpoint(fwd) if remat else fwd

    def loss_fn(params, images_u8, labels, rng):
        x = normalize_batch(images_u8, dtype)
        if dtype == jnp.bfloat16:
            # True mixed precision: master params stay f32 (Adam runs f32),
            # fwd+bwd compute in bf16 via an in-graph cast — without this the
            # f32 weights promote every matmul/conv back to f32 and the
            # "bf16" step silently measures f32 compute. The cast's VJP casts
            # incoming bf16 cotangents back to f32, so gradients land f32.
            from genconvit_tpu.core.pytree import cast_floats

            logits, aux = apply(cast_floats(params, jnp.bfloat16), x, rng)
        else:
            logits, aux = apply(params, x, rng)
        tgt = jnp.concatenate([labels, labels]) if net == "genconvit" else labels
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), tgt).mean()
        loss = ce
        if net in ("vae", "genconvit"):
            recon = aux["vae_recon"].astype(jnp.float32)
            loss = loss + jnp.mean(jnp.square(recon - x.astype(jnp.float32)))
            if use_kl:  # reference keeps this commented out (train/train_vae.py:25)
                loss = loss + aux["vae_kl"]
        preds = jnp.argmax(logits, axis=-1)
        acc = jnp.mean((preds == tgt).astype(jnp.float32))
        return loss, {"acc": acc, "bn_stats": aux.get("vae_bn_stats")}

    return loss_fn


def _write_back_bn(params: Dict[str, Any], bn_stats, net: str) -> Dict[str, Any]:
    """Fold the batch-stat running updates back into the param tree
    (torch buffer-update equivalent)."""
    if bn_stats is None:
        return params
    branch = "vae" if net in ("vae", "genconvit") else None
    if branch is None or branch not in params:
        return params
    def merge(olds, news):
        # stats keep the tree's storage dtype (mixed-precision steps compute
        # them in bf16; the master tree stays f32)
        return [old if new is None else
                {**old,
                 "mean": new["mean"].astype(old["mean"].dtype),
                 "var": new["var"].astype(old["var"].dtype)}
                for old, new in zip(olds, news)]

    params = dict(params)
    vae = dict(params[branch])
    enc = dict(vae["encoder"])
    n_enc = len(enc["bns"])
    enc["bns"] = merge(enc["bns"], bn_stats[:n_enc])
    vae["encoder"] = enc
    # the updated VAE variant also has decoder BNs (models/vae.py
    # vae_updated_decode); their stats follow the encoder's in bn_stats
    if isinstance(vae.get("decoder"), dict) and len(bn_stats) > n_enc:
        dec = dict(vae["decoder"])
        dec["bns"] = merge(dec["bns"], bn_stats[n_enc:])
        vae["decoder"] = dec
    params[branch] = vae
    return params


def make_train_step(net: str, tx: optax.GradientTransformation,
                    use_kl: bool = False, dtype=jnp.float32, donate: bool = True,
                    plan=None):
    loss_fn = make_loss_fn(net, use_kl, dtype, plan=plan)

    def step(params, opt_state, images_u8, labels, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images_u8, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = _write_back_bn(params, aux["bn_stats"], net)
        return params, opt_state, loss, aux["acc"]

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_eval_step(net: str, use_kl: bool = False, dtype=jnp.float32, plan=None):
    from genconvit_tpu.ops.kernel_plan import KernelPlan, plan_scope

    plan = plan or KernelPlan.from_env()

    def step(params, images_u8, labels, rng):
        x = normalize_batch(images_u8, dtype)
        if dtype == jnp.bfloat16:  # same mixed-precision contract as training
            from genconvit_tpu.core.pytree import cast_floats

            params = cast_floats(params, jnp.bfloat16)
        with plan_scope(plan):
            logits, aux = genconvit_apply(params, x, net=net, rng=rng,
                                          sample=True, train=False)
        tgt = jnp.concatenate([labels, labels]) if net == "genconvit" else labels
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), tgt).mean()
        loss = ce
        if net in ("vae", "genconvit"):
            recon = aux["vae_recon"].astype(jnp.float32)
            loss = loss + jnp.mean(jnp.square(recon - x.astype(jnp.float32)))
        preds = jnp.argmax(logits, axis=-1)
        acc = jnp.mean((preds == tgt).astype(jnp.float32))
        return loss, acc, preds

    return jax.jit(step)


def train_model(
    dir_path: str,
    mod: str = "ed",
    num_epochs: int = 1,
    pretrained: Optional[str] = None,
    test_model: bool = False,
    batch_size: int = 32,
    config: Optional[Config] = None,
    weight_dir: Optional[str] = None,
    seed: int = 1,  # ref train.py:67 torch.manual_seed(1)
    use_kl: bool = False,
    save_best: bool = False,
    log_every: int = 10,
    data_parallel: bool = True,
    dtype=jnp.float32,  # jnp.bfloat16 = mixed precision (f32 masters,
    # bf16 fwd/bwd — see make_loss_fn); f32 is the torch-parity default
) -> Dict[str, Any]:
    """Mirror of ref train.py:36-127, data-parallel over all visible chips by
    default (batch sharded on the mesh 'data' axis; XLA all-reduces grads).
    Returns summary dict."""
    config = config or Config()
    weight_dir = weight_dir or config.weight_dir
    datasets, sizes = load_data(dir_path, batch_size, config.img_size, seed=seed)
    log.info("data: %s", sizes)

    mesh = None
    shard_fn = lambda x: jnp.asarray(x)  # noqa: E731
    if data_parallel and jax.device_count() > 1:
        from genconvit_tpu.parallel.mesh import (
            make_mesh, shard_batch, shard_params)

        ndata = jax.device_count()
        if batch_size % ndata:
            batch_size = max(ndata, batch_size - batch_size % ndata)
            log.info("batch size adjusted to %d (multiple of %d chips)",
                     batch_size, ndata)
        mesh = make_mesh(data=ndata, model=1)
        shard_fn = lambda x: shard_batch(np.asarray(x), mesh)  # noqa: E731
        log.info("data-parallel over %d chips", ndata)

    rng = jax.random.PRNGKey(seed)
    params = init_genconvit(rng, config, mod)
    if mesh is not None:
        from genconvit_tpu.parallel.mesh import shard_params

        params = shard_params(params, mesh)
    tx = make_optimizer(config.learning_rate, config.weight_decay)
    opt_state = tx.init(params)
    start_epoch = 0
    min_loss = float(config.min_val_loss)

    if pretrained:
        from genconvit_tpu.core.checkpoint import restore_opt_state

        payload = load_checkpoint(pretrained)
        params = payload["params"]
        if payload.get("opt_state") is not None:
            opt_state = restore_opt_state(tx.init(params), payload["opt_state"])
        start_epoch = payload.get("epoch", 0)
        min_loss = payload.get("min_loss", min_loss)
        log.info("resumed from %s (epoch %d)", pretrained, start_epoch)

    train_step = make_train_step(mod, tx, use_kl, dtype=dtype)
    eval_step = make_eval_step(mod, use_kl, dtype=dtype)
    lr_of = step_lr(config.learning_rate)

    history = {"train_loss": [], "train_acc": [], "valid_loss": [], "valid_acc": []}
    epoch_loss = min_loss
    # best-so-far starts from the checkpoint's min_loss (ref train.py:58
    # threads min_val_loss the same way) so a resumed run can't overwrite
    # genconvit_*_best.gcv with a worse epoch
    best_val = min_loss
    since = time.time()
    step_rng = jax.random.PRNGKey(seed + 1)

    for epoch in range(start_epoch, start_epoch + num_epochs):
        opt_state = set_lr(opt_state, lr_of(epoch))
        losses, accs = [], []
        for bi, (imgs, labels) in enumerate(
                datasets["train"].batches(batch_size, shuffle=True, epoch=epoch,
                          drop_last=mesh is not None)):
            step_rng, k = jax.random.split(step_rng)
            params, opt_state, loss, acc = train_step(
                params, opt_state, shard_fn(imgs), shard_fn(labels), k)
            losses.append(float(loss))
            accs.append(float(acc))
            if bi % log_every == 0:
                log.info("epoch %d batch %d: loss %.4f acc %.4f",
                         epoch, bi, losses[-1], accs[-1])
        epoch_loss = float(np.mean(losses)) if losses else float("nan")
        history["train_loss"].append(epoch_loss)
        history["train_acc"].append(float(np.mean(accs)) if accs else float("nan"))

        vlosses, vaccs = [], []
        for imgs, labels in datasets["valid"].batches(batch_size,
                                                   drop_last=mesh is not None):
            step_rng, k = jax.random.split(step_rng)
            loss, acc, _ = eval_step(params, shard_fn(imgs), shard_fn(labels), k)
            vlosses.append(float(loss))
            vaccs.append(float(acc))
        vloss = float(np.mean(vlosses)) if vlosses else float("nan")
        history["valid_loss"].append(vloss)
        history["valid_acc"].append(float(np.mean(vaccs)) if vaccs else float("nan"))
        log.info("epoch %d: train %.4f/%.4f  valid %.4f/%.4f  (lr %.2e)",
                 epoch, history["train_loss"][-1], history["train_acc"][-1],
                 vloss, history["valid_acc"][-1], lr_of(epoch))
        if save_best and vloss < best_val:
            best_val = vloss
            save_checkpoint(os.path.join(weight_dir, f"genconvit_{mod}_best.gcv"),
                            params, epoch=epoch + 1, min_loss=vloss,
                            extra={"history": history})

    elapsed = time.time() - since
    log.info("Training complete in %.0fm %.0fs", elapsed // 60, elapsed % 60)

    stamp = time.strftime("%b_%d_%Y_%H_%M_%S", time.localtime())
    base = os.path.join(weight_dir, f"genconvit_{mod}_{stamp}")
    os.makedirs(weight_dir, exist_ok=True)
    with open(f"{base}.pkl", "wb") as f:
        pickle.dump([history["train_loss"], history["train_acc"],
                     history["valid_loss"], history["valid_acc"]], f)
    ckpt_path = f"{base}.gcv"
    save_checkpoint(ckpt_path, params,
                    epoch=start_epoch + num_epochs + 1,  # ref semantics: epochs+1
                    min_loss=epoch_loss, opt_state=opt_state)
    log.info("saved %s", ckpt_path)

    summary: Dict[str, Any] = {"history": history, "checkpoint": ckpt_path,
                               "params": params}
    if test_model:
        correct, total = 0, 0
        for imgs, labels in datasets["test"].batches(batch_size,
                                                      drop_last=mesh is not None):
            step_rng, k = jax.random.split(step_rng)
            _, _, preds = eval_step(params, shard_fn(imgs), shard_fn(labels), k)
            preds = np.asarray(preds)[: len(labels)]
            # correct accuracy (the reference's test() indexes labels by
            # prediction — quirk B5 — which we deliberately fix)
            correct += int((preds == np.asarray(labels)).sum())
            total += len(labels)
        log.info("Prediction: %d/%d %.2f%%", correct, total,
                 100.0 * correct / max(total, 1))
        summary["test_accuracy"] = correct / max(total, 1)
    return summary
