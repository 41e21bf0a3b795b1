"""Training CLI: ``python train.py --config configs/MAGMA_v1.yml``.

Parity target: the reference's DeepSpeed-launched trainer (train.py:72-193):
same config surface, dataset concat/split logic, periodic eval +
caption-sampling inference, periodic + final checkpointing, rank-0-gated
metric logging.  TPU-native: one process per host (``jax.distributed`` for
pods), jit-sharded train step over a ("dp", "tp") mesh, Orbax checkpoints,
wandb optional (falls back to JSONL metrics).
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="path to your training config")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() (TPU pods)")
    return parser.parse_args()


def _load_img_cpt_datasets(dataset_dir, tokenizer, transforms, seq_len):
    from magma_tpu.data.dataset import ConcatDataset, ImgCptDataset

    if isinstance(dataset_dir, (list, tuple)):
        return ConcatDataset(
            [_load_img_cpt_datasets(d, tokenizer, transforms, seq_len)
             for d in dataset_dir]
        )
    if isinstance(dataset_dir, str):
        return ImgCptDataset(dataset_dir, tokenizer=tokenizer,
                             transforms=transforms, seq_len=seq_len)
    raise TypeError("dataset dir wrong type")


def get_pretraining_datasets(config, tokenizer, transforms, seq_len):
    from magma_tpu.data.dataset import random_split
    from magma_tpu.utils import print_main

    train_dataset = _load_img_cpt_datasets(
        config.train_dataset_dir, tokenizer, transforms, seq_len
    )
    if config.eval_dataset_dir is None:
        eval_len = int(len(train_dataset) * config.eval_dataset_pct)
        train_len = len(train_dataset) - eval_len
        print_main(
            f"no eval_dataset_dir: holding out {eval_len} of "
            f"{len(train_dataset)} training samples for eval"
        )
        train_dataset, eval_dataset = random_split(
            train_dataset, [train_len, eval_len], seed=config.seed
        )
    else:
        eval_dataset = _load_img_cpt_datasets(
            config.eval_dataset_dir, tokenizer, transforms, seq_len
        )
    print_main(f"Loaded train dataset with {len(train_dataset)} samples")
    print_main(f"Loaded eval dataset with {len(eval_dataset)} samples")
    return train_dataset, eval_dataset


class MetricLogger:
    """wandb when available + always a local JSONL file, rank-0 gated
    (parity: utils.py:79-86, train.py:136-180)."""

    def __init__(self, config):
        import json

        from magma_tpu.utils import is_main

        self._json = json
        self._is_main = is_main()
        self._file = None
        self._wandb = None
        if not self._is_main:
            return
        path = os.path.join(config.save or ".", "metrics.jsonl")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._file = open(path, "a")
        try:
            import wandb

            wandb.init(project=config.wandb_project, name=config.name,
                       config=config.to_dict())
            self._wandb = wandb
        except Exception:
            pass

    def log(self, metrics: dict, step: int) -> None:
        if not self._is_main:
            return
        rec = dict(metrics, step=step, time=time.time())
        self._file.write(self._json.dumps(rec) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, key: str, image, step: int, caption: str = "") -> None:
        """Log a (3, H, W) float image: wandb.Image when live (parity:
        reference train.py:176-180), and always a PNG next to the JSONL."""
        if not self._is_main:
            return
        import numpy as np

        arr = np.asarray(image)
        arr = np.clip(arr, 0.0, 1.0) if arr.dtype.kind == "f" else arr
        if self._wandb is not None:
            self._wandb.log(
                {key: self._wandb.Image(arr, caption=caption or None)}, step=step
            )
        try:
            from PIL import Image

            png = np.transpose((arr * 255).astype("uint8"), (1, 2, 0))
            path = os.path.join(
                os.path.dirname(self._file.name),
                f"{key.replace('/', '_')}_step{step}.png",
            )
            Image.fromarray(png).save(path)
            self.log({key: path, f"{key}/caption": caption}, step)
        except Exception:
            pass  # image logging must never kill a run


def main():
    args = parse_args()
    if args.multihost:
        import jax

        jax.distributed.initialize()

    from magma_tpu import MultimodalConfig, Magma
    from magma_tpu.data.loader import BatchLoader
    from magma_tpu.training.train_loop import Trainer
    from magma_tpu.utils import count_parameters, print_main

    config = MultimodalConfig.from_yml(args.config)
    config.print()

    model = Magma(config, rng=config.seed)
    print_main(
        f"params: {count_parameters(model.params):,} "
        f"(trainable: {count_parameters(model.params, model.trainable_mask()):,})"
    )

    trainer = Trainer(model, config)

    train_dataset, eval_dataset = get_pretraining_datasets(
        config, model.tokenizer, model.transforms, model.seq_len
    )
    train_loader = BatchLoader(
        train_dataset, config.batch_size,
        config.gradient_accumulation_steps, seq_len=model.seq_len,
        num_workers=config.num_workers, seed=config.seed,
    )
    eval_loader = BatchLoader(
        eval_dataset, max(config.batch_size // config.gradient_accumulation_steps, 1),
        1, seq_len=model.seq_len, num_workers=config.num_workers,
        seed=config.seed + 1, flat=True,
    )

    global_step = 0
    if config.load:
        global_step = trainer.load(
            config.load, load_optimizer=config.load_optimizer
        )
        if not config.load_optimizer:
            trainer.global_step = 0
            global_step = 0

    logger = MetricLogger(config)
    print_main(f"training from step {global_step} to {config.train_steps}")

    t_interval = time.time()
    steps_in_interval = 0
    while global_step < config.train_steps:
        images, captions = next(train_loader)
        # async: the device runs this step while the host fetches/queues
        # the next batch; the loss only syncs at logging boundaries
        loss = trainer.train_step(images, captions, sync=False)
        global_step = trainer.global_step
        steps_in_interval += 1

        if global_step % config.log_every == 0:
            loss = float(loss)  # device sync: drains the queued steps
            # amortized per-step time over the interval — timing a single
            # async iteration would measure either ~0 (dispatch only) or
            # the whole backlog drain at the sync
            step_time = (time.time() - t_interval) / steps_in_interval
            t_interval = time.time()
            steps_in_interval = 0
            print_main(
                f"step {global_step} loss {loss:.4f} ({step_time:.2f}s/step)"
            )
            logger.log({"train/loss": loss, "train/step_time": step_time},
                       global_step)

        if global_step % config.eval_every == 0:
            eval_loss = trainer.eval_step(eval_loader)
            logger.log({"eval/loss": eval_loss}, global_step)
            print_main(f"step {global_step} eval loss {eval_loss:.4f}")
            try:
                from magma_tpu.observability import make_grid

                eval_images, caption_text = trainer.inference_step(
                    eval_loader, max_steps=30, temperature=0.7, top_p=0.9
                )
                logger.log({"inference/captions": caption_text}, global_step)
                # image grid of the captioned eval images (parity:
                # reference train.py:176-180 wandb.Image)
                logger.log_image(
                    "inference/images", make_grid(eval_images),
                    global_step, caption=caption_text,
                )
                print_main(caption_text)
            except Exception as e:  # caption sampling must never kill a run
                print_main(f"inference step failed: {e}")

            # downstream QA accuracy (the reference's vqa_dir/gqa_dir knobs,
            # configs/MAGMA_v2.yml:30-31, had no eval code behind them)
            for tag, qa_dir in (("vqa", config.vqa_dir), ("gqa", config.gqa_dir)):
                if not qa_dir:
                    continue
                try:
                    from magma_tpu.evaluation import eval_vqa

                    trainer.sync_model()
                    res = eval_vqa(model, qa_dir, n_samples=64)
                    logger.log({f"eval/{tag}_accuracy": res["accuracy"]},
                               global_step)
                    print_main(
                        f"step {global_step} {tag} accuracy "
                        f"{res['accuracy']:.3f} over {res['n']} questions"
                    )
                except Exception as e:
                    print_main(f"{tag} eval failed: {e}")

        if config.save is not None and global_step % config.save_every == 0:
            trainer.save(config.save)
            print_main(f"saving model at step {global_step}")

    if config.save is not None:
        trainer.save(config.save)
        print_main(f"saving model at end of training (step {global_step})")


if __name__ == "__main__":
    main()
