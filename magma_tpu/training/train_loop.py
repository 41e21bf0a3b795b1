"""Jit-sharded training: one compiled step = grad-accum scan + psum'd loss
+ optimizer update, batch-sharded over the "dp" mesh axis with
tensor-parallel LM layouts over "tp".

Replaces the reference's DeepSpeed engine loop (magma/train_loop.py:7-21,
train.py:103-111):

* gradient accumulation is a ``lax.scan`` over microbatches *inside* the
  jitted step (the reference loops in python over engine.backward calls),
* the cross-device gradient all-reduce, loss mean (utils.py:26-34) and
  optimizer-state sharding (ZeRO-2) are all emitted by XLA from sharding
  annotations — no NCCL plumbing,
* the frozen LM is partitioned out of the differentiated tree entirely
  (parallel/partition.py): no gradients, no optimizer state, no ZeRO
  bookkeeping for 6B frozen parameters,
* run_blind zeroes images (train_loop.py:13-14 parity),
* eval_step averages loss over eval batches (train_loop.py:48-60),
* inference_step generates captions for logging — implementing properly
  what the reference left broken (train_loop.py:90-92 calls a forward
  signature that doesn't exist; SURVEY.md §3 quirks).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from magma_tpu.config import MultimodalConfig
from magma_tpu.parallel.mesh import make_mesh
from magma_tpu.parallel.partition import combine, partition
from magma_tpu.parallel.sharding import make_param_shardings
from magma_tpu.training.optim import make_optimizer


class Trainer:
    """Owns sharded params/opt state and the compiled train/eval steps."""

    def __init__(self, model, config: MultimodalConfig, mesh=None):
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(
            config.mesh_dp, config.mesh_tp, getattr(config, "mesh_sp", 1)
        )
        self.global_step = 0

        if model.lm_config.attention_impl == "ring":
            # thread the mesh into gptj.forward's ring-attention shard_map
            if model.lm_config.sp_axis not in self.mesh.axis_names:
                raise ValueError(
                    f"attention_impl='ring' needs a mesh with an "
                    f"'{model.lm_config.sp_axis}' axis (set mesh_sp > 1); "
                    f"got axes {self.mesh.axis_names}")
            model.sp_mesh = self.mesh

        mask = model.trainable_mask()
        self._mask = mask
        trainable, frozen = partition(model.params, mask)
        self.optimizer, self.opt_labels = make_optimizer(config, trainable)

        # place params on the mesh with canonical layouts
        shardings = make_param_shardings(self.mesh, model.params)
        t_shard, f_shard = partition(shardings, mask)
        put = lambda tree, sh: jax.tree_util.tree_map(jax.device_put, tree, sh)
        self.trainable = put(trainable, t_shard)
        self.frozen = put(frozen, f_shard)
        self._t_shardings, self._f_shardings = t_shard, f_shard

        repl = NamedSharding(self.mesh, P())
        self.state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), model.state
        )
        # the Trainer owns the (re-placed) parameters from here: drop the
        # facade's references so the original buffers free immediately —
        # otherwise two full copies of a 6B model coexist and OOM a chip.
        # sync_model() hands ownership back for generation/checkpointing.
        model.params = None
        model.state = None
        del trainable, frozen

        # optimizer state created under jit from sharded params inherits
        # the parameter shardings (ZeRO-style state partitioning for free)
        self.opt_state = jax.jit(self.optimizer.init)(self.trainable)

        self._batch_sharding = NamedSharding(self.mesh, P(None, "dp"))
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------
    def _build_train_step(self):
        config, model, optimizer = self.config, self.model, self.optimizer
        mesh = self.mesh

        def step_fn(trainable, frozen, opt_state, state, images, captions,
                    rng, step_idx):
            # images: (ga, micro_b, 3, H, W); captions: (ga, micro_b, s)
            if config.run_blind:
                images = jnp.zeros_like(images)

            def micro(trainable, state, imgs, caps, r):
                params = combine(trainable, frozen)
                loss, (new_state, _) = model.loss_fn(
                    params, state, imgs, caps, train=True, rng=r
                )
                return loss, new_state

            grad_fn = jax.value_and_grad(micro, has_aux=True)
            ga = images.shape[0]

            if ga == 1:
                # no accumulation buffers: saves a full fp32 gradient-sized
                # allocation, the margin for single-chip 6B finetuning
                (loss, new_state), grads = grad_fn(
                    trainable, state, images[0], captions[0],
                    jax.random.fold_in(rng, 0),
                )
            else:
                def body(carry, xs):
                    g_acc, loss_acc, state = carry
                    imgs, caps, i = xs
                    (l, new_state), grads = grad_fn(
                        trainable, state, imgs, caps,
                        jax.random.fold_in(rng, i),
                    )
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                    return (g_acc, loss_acc + l, new_state), None

                g0 = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), trainable
                )
                (grads, loss_sum, new_state), _ = jax.lax.scan(
                    body, (g0, 0.0, state),
                    (images, captions, jnp.arange(ga)),
                )
                # accumulate in fp32, hand the optimizer param-dtype grads
                # (same as the ga=1 path): apply_if_finite's cond needs the
                # updated Adam state to match the resident one's dtypes —
                # fp32 grads against bf16 mu/nu promote and trip it
                grads = jax.tree_util.tree_map(
                    lambda g, p: (g / ga).astype(p.dtype), grads, trainable
                )
                loss = loss_sum / ga

            updates, new_opt_state = optimizer.update(
                grads, opt_state, trainable
            )
            new_trainable = optax.apply_updates(trainable, updates)
            return new_trainable, new_opt_state, new_state, loss

        repl = NamedSharding(mesh, P())
        return jax.jit(
            step_fn,
            in_shardings=(
                self._t_shardings, self._f_shardings, None, None,
                self._batch_sharding, self._batch_sharding, repl, None,
            ),
            donate_argnums=(0, 2, 3),
        )

    def _build_eval_step(self):
        config, model = self.config, self.model

        def eval_fn(trainable, frozen, state, images, captions):
            if config.run_blind:
                images = jnp.zeros_like(images)
            params = combine(trainable, frozen)
            loss, _ = model.loss_fn(
                params, state, images, captions, train=False
            )
            return loss

        batch2d = NamedSharding(self.mesh, P("dp"))
        return jax.jit(
            eval_fn,
            in_shardings=(
                self._t_shardings, self._f_shardings, None, batch2d, batch2d
            ),
        )

    # ------------------------------------------------------------------
    @property
    def params(self) -> Dict:
        """Current full (combined) parameter tree."""
        return combine(self.trainable, self.frozen)

    def sync_model(self) -> None:
        """Write current params/state back into the Magma facade (for
        generation / checkpointing through model APIs)."""
        self.model.params = self.params
        self.model.state = self.state

    # ------------------------------------------------------------------
    def train_step(self, images: np.ndarray, captions: np.ndarray,
                   rng: Optional[jax.Array] = None, sync: bool = True):
        """One optimizer step over a global batch laid out as
        (ga, micro_batch, ...).  Returns the mean loss (already globally
        reduced by the sharded computation).

        ``sync=False`` returns the loss as a device scalar without
        blocking: the host races ahead and queues the next step while the
        device runs this one.  Blocking every step costs 30-50 ms of
        dead device time on tunneled transports (measured on the 6B QLoRA
        step: 125 -> ~90 ms/step); convert at logging boundaries instead
        (``float(loss)``)."""
        ga = self.config.gradient_accumulation_steps
        if images.ndim == 4:  # accept flat (B, ...) too
            images = images.reshape(ga, -1, *images.shape[1:])
            captions = captions.reshape(ga, -1, captions.shape[-1])
        if rng is None:
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.config.seed), self.global_step
            )
        self.trainable, self.opt_state, self.state, loss = self._train_step(
            self.trainable, self.frozen, self.opt_state, self.state,
            jnp.asarray(images), jnp.asarray(captions), rng,
            jnp.int32(self.global_step),
        )
        self.global_step += 1
        return float(loss) if sync else loss

    def eval_step(self, eval_loader, eval_steps: Optional[int] = None) -> float:
        """Mean loss over ``eval_steps`` batches (train_loop.py:48-60)."""
        n = eval_steps if eval_steps is not None else self.config.eval_steps
        losses = []
        for _ in range(n):
            images, captions = next(eval_loader)
            losses.append(
                float(
                    self._eval_step(
                        self.trainable, self.frozen, self.state,
                        jnp.asarray(images), jnp.asarray(captions),
                    )
                )
            )
        return float(np.mean(losses))

    def inference_step(self, eval_loader, max_images: int = 2,
                       **generate_kwargs) -> Tuple[np.ndarray, str]:
        """Generate captions for eval images (fixes train_loop.py:85-98).
        Returns (images, caption text block) for metric logging."""
        images, _ = next(eval_loader)
        images = np.asarray(images)[:max_images]
        if self.config.run_blind:
            images = np.zeros_like(images)
        self.sync_model()
        embeddings = self.model.embed([jnp.asarray(images)])
        captions = self.model.generate(embeddings, **generate_kwargs)
        text = "".join(
            f"Caption {i}: \n{c}\n" for i, c in enumerate(captions)
        )
        return images, text

    # ------------------------------------------------------------------
    # Classification fine-tuning (train_loop.py:24-45, 63-82 parity; the
    # reference shipped the steps but no working model — see
    # models/classifier.py)
    # ------------------------------------------------------------------
    def _classification_step(self, train: bool):
        config, model, optimizer = self.config, self.model, self.optimizer

        def loss_fn(trainable, state, images, captions, labels, rng):
            params = combine(trainable, self.frozen)
            loss, (new_state, logits) = model.classification_loss_fn(
                params, state, images, captions, labels, train=train, rng=rng
            )
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            )
            return loss, (new_state, acc)

        if not train:
            def eval_fn(trainable, frozen, state, images, captions, labels):
                params = combine(trainable, frozen)
                loss, (_, logits) = model.classification_loss_fn(
                    params, state, images, captions, labels, train=False
                )
                acc = jnp.mean(
                    (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
                )
                return loss, acc

            return jax.jit(eval_fn)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step_fn(trainable, frozen, opt_state, state, images, captions,
                    labels, rng):
            (loss, (new_state, acc)), grads = grad_fn(
                trainable, state, images, captions, labels, rng
            )
            updates, new_opt_state = optimizer.update(
                grads, opt_state, trainable
            )
            new_trainable = optax.apply_updates(trainable, updates)
            return new_trainable, new_opt_state, new_state, loss, acc

        return jax.jit(step_fn, donate_argnums=(0, 2, 3))

    def train_step_classification(self, images, captions, class_labels,
                                  rng=None, return_accuracy: bool = True):
        """One classification step over (list-of-)image batches.  Returns
        loss (and accuracy)."""
        if not hasattr(self, "_cls_train"):
            self._cls_train = self._classification_step(train=True)
        if rng is None:
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.config.seed), self.global_step
            )
        images = [jnp.asarray(i) for i in images] if isinstance(
            images, (list, tuple)) else jnp.asarray(images)
        self.trainable, self.opt_state, self.state, loss, acc = (
            self._cls_train(
                self.trainable, self.frozen, self.opt_state, self.state,
                images, jnp.asarray(captions), jnp.asarray(class_labels), rng,
            )
        )
        self.global_step += 1
        if return_accuracy:
            return float(loss), float(acc)
        return float(loss)

    def eval_step_classification(self, images, captions, class_labels,
                                 return_accuracy: bool = True):
        if not hasattr(self, "_cls_eval"):
            self._cls_eval = self._classification_step(train=False)
        images = [jnp.asarray(i) for i in images] if isinstance(
            images, (list, tuple)) else jnp.asarray(images)
        loss, acc = self._cls_eval(
            self.trainable, self.frozen, self.state, images,
            jnp.asarray(captions), jnp.asarray(class_labels),
        )
        if return_accuracy:
            return float(loss), float(acc)
        return float(loss)

    # ------------------------------------------------------------------
    def save(self, save_dir: str) -> None:
        from magma_tpu.training import checkpoint as ckpt

        ckpt.save_checkpoint(
            save_dir, self.global_step, self.params, self.state,
            opt_state=self.opt_state, config=self.config,
        )

    def load(self, load_dir: str, load_optimizer: bool = True) -> int:
        """Resume; returns the restored global step (0 if nothing found),
        matching utils.py:99-117 semantics."""
        from magma_tpu.training import checkpoint as ckpt

        mask = self._mask
        params, state, opt_state, step = ckpt.load_checkpoint(
            load_dir, self.params, self.state,
            self.opt_state if load_optimizer else None,
        )
        if params is None:
            return 0
        shardings = make_param_shardings(self.mesh, params)
        t, f = partition(params, mask)
        t_sh, f_sh = partition(shardings, mask)
        put = lambda tree, sh: jax.tree_util.tree_map(jax.device_put, tree, sh)
        self.trainable, self.frozen = put(t, t_sh), put(f, f_sh)
        if state is not None:
            self.state = state
        if load_optimizer and opt_state is not None:
            self.opt_state = opt_state
            self.global_step = step
        return step
