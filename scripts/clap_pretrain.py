"""CLAP contrastive pretraining CLI — the TPU-native analog of the
reference's vendored harness entry (models/CLAP/training/main.py): datafile
JSONs of (wav, caption) pairs -> jitted contrastive step (ClipLoss + dual
clamped scales, lass_tpu.tasks.clap_pretrain) with the cosine-warmup
schedule (training/scheduler.py:13-24), AdamW (params.py defaults:
betas 0.99/0.9 fused per model — we expose them as flags), periodic
retrieval evaluation (train.py:519-591 metrics), and orbax checkpoints.

    python scripts/clap_pretrain.py --workspace WS --datafiles D.json \
        [--val_datafiles V.json] [--amodel HTSAT-tiny|HTSAT-base] \
        [--batch_size 32] [--max_steps N]

The webdataset tar pipeline of the reference is intentionally replaced by
the datafile/DataModule host pipeline (zero-egress environment; same
(wav, caption) sample contract).
"""
import argparse
import logging
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workspace", required=True)
    parser.add_argument("--datafiles", nargs="+", default=None)
    parser.add_argument("--train_shards", nargs="+", default=None,
                        help="tar shards (webdataset layout: key.wav + "
                        "key.json per sample; brace patterns OK) — the "
                        "reference's --train-data path (data.py:676)")
    parser.add_argument("--data_filling", default="repeatpad",
                        choices=["repeatpad", "pad", "repeat"])
    parser.add_argument("--data_truncating", default="rand_trunc",
                        choices=["rand_trunc", "fusion"])
    parser.add_argument("--text_augment_selection", default=None,
                        choices=[None, "none", "all", "augment_only"])
    parser.add_argument("--val_datafiles", nargs="+", default=None)
    parser.add_argument("--amodel", default="HTSAT-base",
                        choices=["HTSAT-tiny", "HTSAT-base", "PANN-14"])
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--clip_seconds", type=float, default=10.0)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--beta1", type=float, default=0.9)
    parser.add_argument("--beta2", type=float, default=0.99)
    parser.add_argument("--eps", type=float, default=1e-8)
    parser.add_argument("--wd", type=float, default=0.0)
    parser.add_argument("--warmup", type=int, default=3200)
    parser.add_argument("--total_steps", type=int, default=1000000)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--eval_every", type=int, default=10000)
    parser.add_argument("--save_every", type=int, default=20000)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_text_len", type=int, default=77)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lass_tpu.data.datafiles import AudioTextDataset
    from lass_tpu.data.datamodule import DataModule
    from lass_tpu.evaluation.retrieval import retrieval_metrics
    from lass_tpu.models.clap.model import CLAPAudioEncoder, CLAPTextEncoder
    from lass_tpu.models.clap.htsat import (
        htsat_base_config, htsat_tiny_config)
    from lass_tpu.parallel.host import host_info, put_global_batch
    from lass_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from lass_tpu.tasks.clap_pretrain import CLAPPretrainTask
    from lass_tpu.train.checkpoint import CheckpointManager
    from lass_tpu.train.loop import get_dirs
    from lass_tpu.train.optim import cosine_warm_up
    from lass_tpu.utils.logging import MetricsLogger, create_logging

    ckpt_dir, logs_dir, tf_logs_dir, _ = get_dirs(
        args.workspace, pathlib.Path(__file__).stem, "clap_pretrain.yaml",
        len(jax.devices()))
    create_logging(logs_dir)

    sample_rate = 48000
    clip_samples = int(sample_rate * args.clip_seconds)
    if args.amodel == "PANN-14":
        from lass_tpu.models.clap.model import CLAPPANNAudioEncoder

        audio_encoder = CLAPPANNAudioEncoder()
    else:
        htsat_cfg = (htsat_tiny_config() if args.amodel == "HTSAT-tiny"
                     else htsat_base_config())
        audio_encoder = CLAPAudioEncoder(htsat_cfg=htsat_cfg)
    text_encoder = CLAPTextEncoder()
    from lass_tpu.models.clap.tokenizer import (
        RobertaBPETokenizer, WhitespaceFallbackTokenizer)

    try:
        tokenizer = RobertaBPETokenizer()
    except FileNotFoundError:
        logging.warning("RoBERTa BPE assets not found — whitespace "
                        "fallback tokenizer (smoke runs only)")
        tokenizer = WhitespaceFallbackTokenizer(50265)

    schedule = cosine_warm_up(args.warmup, args.total_steps)
    optimizer = optax.chain(
        optax.scale_by_adam(b1=args.beta1, b2=args.beta2, eps=args.eps),
        optax.add_decayed_weights(args.wd) if args.wd else
        optax.identity(),
        optax.scale_by_learning_rate(lambda s: args.lr * schedule(s)))
    task = CLAPPretrainTask(audio_encoder, text_encoder, optimizer)

    if bool(args.datafiles) == bool(args.train_shards):
        parser.error("exactly one of --datafiles / --train_shards")
    proc_idx, proc_count = host_info()
    if args.train_shards:
        from lass_tpu.data.shards import TarShardDataset

        def train_batches():
            """Epoch-looped tar-shard stream (reference wds path)."""
            epoch = 0
            while True:
                ds = TarShardDataset(
                    shards=args.train_shards,
                    batch_size=args.batch_size // proc_count,
                    max_len=clip_samples,
                    data_filling=args.data_filling,
                    data_truncating=args.data_truncating,
                    text_augment_selection=args.text_augment_selection,
                    num_workers=args.num_workers, seed=args.seed,
                    epoch=epoch, process_index=proc_idx,
                    process_count=proc_count)
                yielded = 0
                for batch in ds:
                    yield {"waveform": batch["waveform"],
                           "text": batch["raw_text"]}
                    yielded += 1
                if yielded == 0:
                    # partial batches are dropped in train mode — a shard
                    # split smaller than one batch would busy-spin forever
                    raise RuntimeError(
                        "train shards produced zero full batches for this "
                        f"host (batch_size={args.batch_size // proc_count}, "
                        f"host {proc_idx}/{proc_count}) — check the shard "
                        "pattern / per-host split / batch size")
                epoch += 1

        n_train = TarShardDataset(
            shards=args.train_shards, batch_size=1,
            max_len=clip_samples).num_samples or -1
    else:
        dataset = AudioTextDataset(datafiles=args.datafiles,
                                   sampling_rate=sample_rate,
                                   max_clip_len=args.clip_seconds)
        dm = DataModule(dataset, batch_size=args.batch_size // proc_count,
                        num_workers=args.num_workers, seed=args.seed,
                        process_index=proc_idx, process_count=proc_count)

        def train_batches():
            for batch in dm.train_dataloader():
                at = batch["audio_text"]
                yield {"waveform": at["waveform"][:, 0],
                       "text": at["text"]}

        n_train = len(dataset)

    mesh = make_mesh(jax.devices())
    bs, rep = batch_sharding(mesh), replicated(mesh)

    def tokenize(texts):
        tok = tokenizer(texts, max_length=args.max_text_len, pad_to=None)
        return (np.asarray(tok["input_ids"]),
                np.asarray(tok["attention_mask"]))

    state = task.init_state(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, clip_samples), jnp.float32),
        jnp.zeros((1, args.max_text_len), jnp.int32))
    state = jax.device_put(state, rep)

    ckpt = CheckpointManager(ckpt_dir, save_step_frequency=args.save_every)
    metrics_log = MetricsLogger(tf_logs_dir, run_name="clap_pretrain")
    step_fn = jax.jit(task.train_step, donate_argnums=(0,))

    @jax.jit
    def embed_pair(params, batch_stats, waveform, ids, mask):
        a = audio_encoder.apply({"params": params["audio"],
                                 "batch_stats": batch_stats},
                                waveform, False)
        t = text_encoder.apply({"params": params["text"]}, ids, mask)
        return a, t

    def evaluate(state):
        if not args.val_datafiles:
            return {}
        val = AudioTextDataset(datafiles=args.val_datafiles,
                               sampling_rate=sample_rate,
                               max_clip_len=args.clip_seconds)
        a_all, t_all = [], []
        vdm = DataModule(val, batch_size=args.batch_size,
                         num_workers=args.num_workers, seed=1)
        seen = 0
        for batch in vdm.train_dataloader():
            at = batch["audio_text"]
            ids, mask = tokenize(at["text"])
            a, t = embed_pair(state.params, state.batch_stats,
                              jnp.asarray(at["waveform"][:, 0]),
                              jnp.asarray(ids), jnp.asarray(mask))
            a_all.append(np.asarray(a))
            t_all.append(np.asarray(t))
            seen += len(at["text"])
            if seen + args.batch_size > len(val):
                break
        if not a_all:
            return {}
        return retrieval_metrics(np.concatenate(a_all),
                                 np.concatenate(t_all))

    logging.info("clap_pretrain: %s, %d train items, batch %d",
                 args.amodel, n_train, args.batch_size)
    with mesh:
        for batch in train_batches():
            ids, mask = tokenize(batch["text"])
            data = put_global_batch(
                {"waveform": batch["waveform"],
                 "input_ids": ids, "attention_mask": mask}, bs)
            state, m = step_fn(state, data)
            step = int(state.step)
            if step % 50 == 0 or step == 1:
                row = {k: float(v) for k, v in m.items()}
                logging.info("step %d %s", step, row)
                metrics_log.log(step, row)
            if args.val_datafiles and step % args.eval_every == 0:
                r = evaluate(state)
                logging.info("retrieval @ %d: %s", step, r)
                metrics_log.log(step, r)
            ckpt.maybe_save(step, state)
            if args.max_steps and step >= args.max_steps:
                break
    ckpt.wait()
    metrics_log.finish()
    if args.val_datafiles:
        print("final retrieval:", evaluate(state))


if __name__ == "__main__":
    main()
