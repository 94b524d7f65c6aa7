"""Linear-probe training CLI — the TPU-native analog of the reference's
lp_main.py/lp_train.py (models/CLAP/training/): attach a probe head to a
frozen CLAP audio trunk and train it on tagged audio shards.

    python scripts/linear_probe.py --workspace WS \
        --train_shards 'shards/train-{000000..000009}.tar' \
        --class_index classes.json [--val_shards ...] \
        [--amodel HTSAT-tiny|HTSAT-base|PANN-14] [--mlp] \
        [--loss bce|ce|mse] [--init_npz clap_pack.npz]

Shards follow the webdataset layout (key.wav + key.json per sample) with a
``tag`` list in the json (lass_tpu/data/shards.py); ``--class_index`` maps
tag -> column. The probe trains with LPLoss (lp_train.py LPLoss) under the
cosine-warmup schedule and reports LPMetrics (mAP/acc/mAUC,
lp_train.py LPMetrics) on the validation shards.
"""
import argparse
import json
import logging
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workspace", required=True)
    parser.add_argument("--train_shards", nargs="+", required=True)
    parser.add_argument("--val_shards", nargs="+", default=None)
    parser.add_argument("--class_index", required=True,
                        help="JSON file: {tag: column} (reference "
                        "class_index_dict)")
    parser.add_argument("--amodel", default="HTSAT-base",
                        choices=["HTSAT-tiny", "HTSAT-base", "PANN-14"])
    parser.add_argument("--mlp", action="store_true",
                        help="MLP probe head (reference --lp-mlp)")
    parser.add_argument("--loss", default="bce", choices=["bce", "ce", "mse"])
    parser.add_argument("--act", default=None,
                        choices=[None, "None", "relu", "elu", "sigmoid",
                                 "softmax"])
    parser.add_argument("--init_npz", default=None,
                        help="converted CLAP pack (convert_checkpoint.py "
                        "--kind clap) to initialize the frozen trunk")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--clip_seconds", type=float, default=10.0)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--wd", type=float, default=0.0)
    parser.add_argument("--warmup", type=int, default=3200)
    parser.add_argument("--total_steps", type=int, default=100000)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--eval_every", type=int, default=5000)
    parser.add_argument("--save_every", type=int, default=10000)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lass_tpu.data.shards import TarShardDataset
    from lass_tpu.evaluation.linear_probe import LPMetrics, lp_loss
    from lass_tpu.models.clap.htsat import (
        htsat_base_config, htsat_tiny_config)
    from lass_tpu.models.clap.linear_probe import LinearProbe
    from lass_tpu.train.checkpoint import CheckpointManager
    from lass_tpu.train.loop import get_dirs
    from lass_tpu.train.optim import cosine_warm_up
    from lass_tpu.utils.logging import MetricsLogger, create_logging

    ckpt_dir, logs_dir, tf_logs_dir, _ = get_dirs(
        args.workspace, pathlib.Path(__file__).stem, "linear_probe.yaml",
        len(jax.devices()))
    create_logging(logs_dir)

    class_index = json.load(open(args.class_index))
    n_classes = len(class_index)
    sample_rate = 48000
    clip_samples = int(sample_rate * args.clip_seconds)

    if args.amodel == "PANN-14":
        probe = LinearProbe(n_classes, mlp=args.mlp, act=args.act,
                            audio_model="PANN")
    else:
        cfg = (htsat_tiny_config() if args.amodel == "HTSAT-tiny"
               else htsat_base_config())
        probe = LinearProbe(n_classes, mlp=args.mlp, act=args.act,
                            audio_model="HTSAT", audio_cfg=cfg)

    rng = jax.random.PRNGKey(args.seed)
    dummy = jnp.zeros((1, clip_samples), jnp.float32)
    variables = probe.init(rng, dummy, False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if args.init_npz:
        from lass_tpu.convert.checkpoint_io import load_npz_variables

        pack = load_npz_variables(args.init_npz)
        if "audio" not in pack:
            raise SystemExit(f"{args.init_npz}: no audio branch in pack")
        trunk = jax.tree_util.tree_map(jnp.asarray, pack["audio"]["params"])
        params = dict(params, clap_model=trunk)
        batch_stats = {"clap_model": jax.tree_util.tree_map(
            jnp.asarray, pack["audio"].get("batch_stats", {}))}
        logging.info("trunk initialized from %s", args.init_npz)
    else:
        logging.warning(
            "linear probe trunk is RANDOM-INIT (no --init_npz) — probe "
            "metrics will be meaningless; convert a CLAP checkpoint with "
            "scripts/convert_checkpoint.py --kind clap")

    loss_fn = lp_loss(args.loss)
    schedule = cosine_warm_up(args.warmup, args.total_steps)
    optimizer = optax.chain(
        optax.scale_by_adam(),
        optax.add_decayed_weights(args.wd) if args.wd else optax.identity(),
        optax.scale_by_learning_rate(lambda s: args.lr * schedule(s)))
    opt_state = optimizer.init(params["lp_layer"])

    dropout_base = jax.random.PRNGKey(args.seed + 1)

    @jax.jit
    def train_step(params, opt_state, wav, target, step):
        # --mlp probe heads contain nn.Dropout, which needs a per-step
        # 'dropout' PRNG stream in train mode
        dropout_key = jax.random.fold_in(dropout_base, step)

        def compute(lp_params):
            logits = probe.apply(
                {"params": dict(params, lp_layer=lp_params),
                 "batch_stats": batch_stats}, wav, True,
                rngs={"dropout": dropout_key})
            return loss_fn(logits, target)

        loss, grads = jax.value_and_grad(compute)(params["lp_layer"])
        updates, new_opt = optimizer.update(grads, opt_state,
                                            params["lp_layer"])
        new_lp = optax.apply_updates(params["lp_layer"], updates)
        return dict(params, lp_layer=new_lp), new_opt, loss

    @jax.jit
    def infer(params, wav):
        return probe.apply({"params": params,
                            "batch_stats": batch_stats}, wav, False)

    def batches(shards, train, epoch=0):
        return TarShardDataset(
            shards=shards, batch_size=args.batch_size,
            max_len=clip_samples, class_index_dict=class_index,
            num_workers=args.num_workers, seed=args.seed, train=train,
            epoch=epoch)

    def evaluate(params):
        if not args.val_shards:
            return {}
        preds, targets = [], []
        for batch in batches(args.val_shards, train=False):
            wav = batch["waveform"]
            pad = args.batch_size - len(wav)
            if pad:
                wav = np.pad(wav, ((0, pad), (0, 0)))
            out = np.asarray(infer(params, jnp.asarray(wav)))
            preds.append(out[:len(batch["waveform"])])
            targets.append(batch["class_label"])
        if not preds:
            return {}
        metrics = LPMetrics()
        return metrics.evaluate_metrics(np.concatenate(preds),
                                        np.concatenate(targets))

    ckpt = CheckpointManager(ckpt_dir, save_step_frequency=args.save_every)
    metrics_log = MetricsLogger(tf_logs_dir, run_name="linear_probe")
    logging.info("linear_probe: %s, %d classes, loss=%s, mlp=%s",
                 args.amodel, n_classes, args.loss, args.mlp)

    step = 0
    epoch = 0
    done = False
    while not done:
        for batch in batches(args.train_shards, train=True, epoch=epoch):
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(batch["waveform"]),
                jnp.asarray(batch["class_label"]), step)
            step += 1
            if step == 1 or step % 50 == 0:
                row = {"lp_loss": float(loss)}
                logging.info("step %d %s", step, row)
                metrics_log.log(step, row)
            if args.val_shards and step % args.eval_every == 0:
                r = evaluate(params)
                logging.info("lp metrics @ %d: %s", step, r)
                metrics_log.log(step, r)
            ckpt.maybe_save(step, {"params": params,
                                   "opt_state": opt_state})
            if args.max_steps and step >= args.max_steps:
                done = True
                break
        epoch += 1
    ckpt.wait()
    metrics_log.finish()
    final = evaluate(params)
    if final:
        print("final lp metrics:", final)


if __name__ == "__main__":
    main()
