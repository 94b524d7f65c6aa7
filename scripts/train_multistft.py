"""Train the multi-resolution-STFT / neg-query variants over precomputed
STFT batches (the reference's audiosep_with_multistft / _with_neg_query
training paths, models/audiosep_with_multistft.py:79-141 and
models/audiosep_with_neg_query.py:43-122).

    python scripts/train_multistft.py --workspace WS \
        --config_yaml config/audiosep_base.yaml --precomputed_dir DIR \
        [--variant multistft|negquery] [--max_steps N]
"""
import argparse
import logging
import os
import pathlib


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workspace", required=True)
    parser.add_argument("--config_yaml", required=True)
    parser.add_argument("--precomputed_dir", required=True)
    parser.add_argument("--variant", default="multistft",
                        choices=["multistft", "negquery"])
    parser.add_argument("--max_steps", type=int, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lass_tpu.config import load_config
    from lass_tpu.data.precomputed import PrecomputedSTFTDataset
    from lass_tpu.models.query_encoder import CLAPQueryEncoder
    from lass_tpu.models.resunet_multistft import MultiSTFTResUNet30
    from lass_tpu.tasks.audiosep_variants import (
        MultiSTFTAudioSepTask, NegQueryAudioSepTask, negative_captions)
    from lass_tpu.train.checkpoint import CheckpointManager
    from lass_tpu.train.loop import get_dirs
    from lass_tpu.train.optim import build_optimizer
    from lass_tpu.utils.logging import MetricsLogger, create_logging

    cfg = load_config(args.config_yaml)
    dataset = PrecomputedSTFTDataset(args.precomputed_dir)
    if len(dataset) == 0:
        raise SystemExit(f"no precomputed batches in {args.precomputed_dir}")
    wins = tuple(dataset.win_lengths()) if args.variant == "multistft" \
        else (512,)

    ckpt_dir, logs_dir, tf_logs_dir, _ = get_dirs(
        args.workspace, pathlib.Path(__file__).stem, args.config_yaml,
        len(jax.devices()))
    create_logging(logs_dir)

    model = MultiSTFTResUNet30(
        win_lengths=wins,
        condition_size=cfg.model.condition_size,
        compute_dtype=jnp.bfloat16
        if cfg.model.compute_dtype == "bfloat16" else jnp.float32)
    optimizer = build_optimizer(
        cfg.train.optimizer.optimizer_type,
        cfg.train.optimizer.learning_rate,
        cfg.train.optimizer.lr_lambda_type,
        cfg.train.optimizer.warm_up_steps,
        cfg.train.optimizer.reduce_lr_steps)
    if args.variant == "negquery":
        task = NegQueryAudioSepTask(model, optimizer)
    else:
        task = MultiSTFTAudioSepTask(model, optimizer)

    query_encoder = CLAPQueryEncoder()
    ckpt = CheckpointManager(ckpt_dir, cfg.train.save_step_frequency)
    metrics = MetricsLogger(tf_logs_dir)

    def to_arrays(raw):
        wanted = {w: raw["stfts"]["mixture"][w] for w in wins}
        seg = {w: raw["stfts"]["segment"][w] for w in wins}
        return {
            "stfts": {
                "mixture": jax.tree_util.tree_map(jnp.asarray, wanted),
                "segment": jax.tree_util.tree_map(jnp.asarray, seg),
            },
            "target_waveform": jnp.asarray(raw["target_waveform"]),
        }

    first = dataset.batch_at(0)
    state = task.init_state(jax.random.PRNGKey(cfg.train.random_seed),
                            to_arrays(first), cfg.model.condition_size)
    step_fn = jax.jit(task.train_step, donate_argnums=(0,))

    stop_at = args.max_steps or cfg.train.early_stop_steps
    for raw in dataset.iterate_batches(loop=True):
        batch = to_arrays(raw)
        if args.variant == "negquery":
            negs = negative_captions(raw["text"],
                                     raw["mixture_component_texts"])
            pos, neg = query_encoder.get_query_embed(
                "text", text=raw["text"], text_neg=negs)
            condition = (jnp.asarray(pos), jnp.asarray(neg))
        else:
            condition = jnp.asarray(query_encoder.get_query_embed(
                "text", text=raw["text"]))
        state, m = step_fn(state, batch, condition)
        step = int(state.step)
        if step % 50 == 0 or step == 1:
            loss = float(m["train_loss"])
            logging.info("step %d loss %.5f", step, loss)
            metrics.log(step, {"train_loss": loss})
        ckpt.maybe_save(step, state)
        if step >= stop_at:
            break
    ckpt.wait()
    metrics.finish()
    print(f"finished at step {int(state.step)}")


if __name__ == "__main__":
    main()
