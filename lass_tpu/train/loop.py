"""End-to-end training loop.

Replaces the reference's Lightning Trainer wiring (train.py:141-294):
workspace layout (get_dirs :22-86), data module, model/loss/mixer/encoder
construction (:206-245), checkpoint cadence (callbacks/base.py), metric
logging, resume. All device math is jitted; batches are sharded over the
mesh 'data' axis (the DDP analog, SURVEY.md §5.8).
"""
from __future__ import annotations

import logging
import os
import pathlib
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lass_tpu.config import Config, load_config
from lass_tpu.data.datafiles import AudioTextDataset
from lass_tpu.data.datamodule import DataModule
from lass_tpu.data.mixer import SegmentMixer
from lass_tpu.losses import get_loss_function
from lass_tpu.models.query_encoder import CLAPQueryEncoder
from lass_tpu.models.resunet import ResUNet30
from lass_tpu.parallel.mesh import (
    batch_sharding, make_mesh, param_shardings, replicated)
from lass_tpu.tasks.audiosep import AudioSepTask, TrainState
from lass_tpu.train.checkpoint import CheckpointManager
from lass_tpu.train.optim import build_optimizer
from lass_tpu.utils.logging import MetricsLogger, create_logging


def get_dirs(workspace: str, filename: str, config_yaml: str,
             devices_num: int) -> List[str]:
    """Workspace layout, same naming as reference train.py:22-86."""
    yaml_name = pathlib.Path(config_yaml).stem
    sub = f"{yaml_name},devices={devices_num}"
    dirs = []
    for kind in ["checkpoints", "logs", "tf_logs", "statistics"]:
        d = os.path.join(workspace, kind, filename, sub)
        os.makedirs(d, exist_ok=True)
        dirs.append(d)
    return dirs


def build_model(cfg: Config):
    if cfg.model.model_type != "ResUNet30":
        raise NotImplementedError(cfg.model.model_type)
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" \
        else jnp.float32
    try:
        dsp = getattr(jax.lax.Precision, cfg.model.dsp_precision.upper())
    except AttributeError:
        raise ValueError(
            f"model.dsp_precision must be one of default/high/highest, "
            f"got {cfg.model.dsp_precision!r}")
    return ResUNet30(
        input_channels=cfg.model.input_channels,
        output_channels=cfg.model.output_channels,
        condition_size=cfg.model.condition_size,
        compute_dtype=dtype,
        dsp_precision=dsp,
    )


class _DevicePrefetcher:
    """Pipelines host batch -> wire encode -> device upload (-> query
    embed, when it doesn't depend on training state) a couple of batches
    ahead of the training loop, on one background thread.

    Why (measured on the axon-tunneled v5e, round 5 probe): a 16x10s
    float32 batch upload completes in ~500 ms when issued serially from
    the step loop but ~250 ms when the next upload is already in flight,
    while the jitted train step is ~167 ms — the serial
    fetch->put->embed->step loop was UPLOAD-bound at 0.35x the jit rate
    (BENCH_r04/r05 dispatch decomposition). jax dispatch is thread-safe;
    the producer thread keeps the host->device link busy while the main
    thread keeps the device compute queue full. Combined with
    train.wire_dtype=int16 (halves upload bytes) the sustained rate
    tracks the in-jit rate.

    ``prepare(i, host_batch)`` runs on the producer thread and returns
    the device-resident item; exceptions re-raise on the consumer side.
    """

    def __init__(self, source, prepare, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None

        def run():
            try:
                for i, batch in enumerate(source):
                    item = prepare(i, batch)
                    while not self._stop.is_set():
                        try:
                            self._q.put((item,), timeout=0.25)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as exc:  # surfaced at next __next__
                self._err = exc
            # sentinel: normal end-of-data or error
            while not self._stop.is_set():
                try:
                    self._q.put(None, timeout=0.25)
                    return
                except queue.Full:
                    continue

        self._thread = threading.Thread(target=run, daemon=True,
                                        name="device-prefetch")
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        wrapped = self._q.get()
        if wrapped is None:
            if self._err is not None:
                err, self._err = self._err, None
                raise RuntimeError("device prefetch failed") from err
            raise StopIteration
        return wrapped[0]

    def close(self):
        self._stop.set()
        # drain so a blocked put wakes up
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=5)


def _encode_wire(waveform: np.ndarray, wire_dtype: str) -> np.ndarray:
    """Host side of config train.wire_dtype: int16 halves the per-step
    upload; tasks/audiosep.py:_decode_wire inverts it on device (exact
    for PCM-sourced audio — read_wav scales by 1/32768)."""
    if wire_dtype != "int16":
        return waveform
    return np.clip(np.rint(np.asarray(waveform) * 32768.0),
                   -32768, 32767).astype(np.int16)


class Trainer:
    def __init__(
        self,
        config_yaml: str,
        workspace: str,
        resume_checkpoint_path: Optional[str] = None,
        query_encoder: Optional[CLAPQueryEncoder] = None,
        model_parallel: int = 1,
        filename: str = "train",
    ):
        self.cfg = load_config(config_yaml)
        devices = jax.devices()
        self.mesh = make_mesh(devices, model_parallel=model_parallel)
        (self.checkpoints_dir, self.logs_dir, self.tf_logs_dir,
         _stats_dir) = get_dirs(workspace, filename, config_yaml,
                                len(devices))
        create_logging(self.logs_dir)
        logging.info("config: %s", self.cfg)

        cfg = self.cfg
        self.task = AudioSepTask(
            model=build_model(cfg),
            mixer=SegmentMixer(cfg.data.max_mix_num,
                               cfg.data.loudness_norm.lower_db,
                               cfg.data.loudness_norm.higher_db),
            optimizer=build_optimizer(
                cfg.train.optimizer.optimizer_type,
                cfg.train.optimizer.learning_rate,
                cfg.train.optimizer.lr_lambda_type,
                cfg.train.optimizer.warm_up_steps,
                cfg.train.optimizer.reduce_lr_steps,
                model_parallel=model_parallel),
            loss_fn=get_loss_function(cfg.train.loss_type),
        )
        if cfg.model.query_net != "CLAP":
            raise NotImplementedError(cfg.model.query_net)
        self.query_encoder = query_encoder or CLAPQueryEncoder()
        self.use_text_ratio = cfg.model.use_text_ratio

        dataset = AudioTextDataset(
            datafiles=cfg.data.datafiles,
            sampling_rate=cfg.data.sampling_rate,
            max_clip_len=cfg.data.segment_seconds,
        )
        # devices spans ALL hosts; each host loads only its shard of the
        # global batch (lass_tpu.parallel.host)
        from lass_tpu.parallel.host import host_info

        proc_idx, proc_count = host_info()
        global_batch = cfg.train.batch_size_per_device * len(devices)
        if global_batch % proc_count:
            raise ValueError(f"global batch {global_batch} not divisible "
                             f"by process_count={proc_count}")
        self.datamodule = DataModule(dataset,
                                     batch_size=global_batch // proc_count,
                                     num_workers=cfg.train.num_workers,
                                     seed=cfg.train.random_seed,
                                     process_index=proc_idx,
                                     process_count=proc_count)

        self.ckpt = CheckpointManager(
            self.checkpoints_dir,
            save_step_frequency=cfg.train.save_step_frequency)
        self.metrics = MetricsLogger(self.tf_logs_dir,
                                     run_name=pathlib.Path(config_yaml).stem)

        from lass_tpu.utils.statistics import StatisticsContainer

        self.statistics = StatisticsContainer(
            os.path.join(os.path.dirname(self.tf_logs_dir).replace(
                "tf_logs", "statistics"), "statistics.pkl"))

        state = self.task.init_state(
            jax.random.PRNGKey(cfg.train.random_seed),
            cfg.data.segment_samples, cfg.model.condition_size)
        if resume_checkpoint_path:
            state = self.ckpt.restore(
                jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state),
                step=_step_from_path(resume_checkpoint_path))
            logging.info("resumed from %s", resume_checkpoint_path)

        # place state/batches on the mesh
        from lass_tpu.train.optim import opt_shardings

        rep = replicated(self.mesh)
        p_shard = param_shardings(state.params, self.mesh)
        self.state = TrainState(
            step=jax.device_put(state.step, rep),
            params=jax.device_put(state.params, p_shard),
            batch_stats=jax.device_put(state.batch_stats, rep),
            opt_state=jax.device_put(
                state.opt_state,
                opt_shardings(state.opt_state, p_shard, rep,
                              model_parallel=model_parallel)),
        )
        self.batch_shard = batch_sharding(self.mesh)
        self.rep = rep
        self._step_fn = jax.jit(self.task.train_step, donate_argnums=(0,))
        # hybrid/audio conditioning: the query encoder must see the MIXED,
        # declip-rescaled segments (reference audiosep.py:77-88 embeds
        # segments AFTER the mixer), so mixing runs in its own jit and the
        # step consumes the premixed batch.
        self._mix_fn = jax.jit(self.task.mix)
        self._premixed_fn = jax.jit(self.task.train_step_premixed,
                                    donate_argnums=(0,))
        # device-side state snapshot for non-blocking checkpointing: the
        # step fns DONATE the state buffers, so a background device->host
        # fetch of self.state would race the next step's donation (jax
        # marks donated arrays deleted). A jnp.copy tree is cheap on-device,
        # is never donated, and frees itself once the saver thread fetches
        # it (CheckpointManager.save_async).
        self._snapshot_fn = jax.jit(
            lambda s: jax.tree_util.tree_map(jnp.copy, s))
        # per-phase wall-clock decomposition of fit(), read by bench.py's
        # sustained bench (VERDICT r4 item 1/6: say WHERE non-jit time
        # goes). data_wait/dispatch/save_block/metrics_fetch/eval are
        # main-thread; prefetch_embed/prefetch_h2d accumulate on the
        # producer thread and OVERLAP the others (they say what the
        # background pipeline spent, not added wall time).
        self.timing = {"data_wait": 0.0, "dispatch": 0.0,
                       "save_block": 0.0, "metrics_fetch": 0.0,
                       "eval": 0.0, "prefetch_embed": 0.0,
                       "prefetch_h2d": 0.0}

    def fit(self, max_steps: Optional[int] = None,
            eval_hook: Optional[callable] = None) -> TrainState:
        """eval_hook(trainer, step) -> dict of metrics; called every
        cfg.train.evaluate_step_frequency steps (reference
        evaluate_step_frequency, config/audiosep_base.yaml:45). Typically
        wraps a DCASEEvaluator over a held-out set."""
        cfg = self.cfg
        stop_at = cfg.train.early_stop_steps
        if max_steps is not None:
            stop_at = min(stop_at, max_steps)
        rng = jax.device_put(
            jax.random.PRNGKey(cfg.train.random_seed + 1), self.rep)

        log_every = 50  # reference train.py:276
        # host-side step mirror: fetching state.step from the device every
        # iteration costs one tunnel round-trip (~29 ms) PER STEP and
        # serializes the otherwise fully async dispatch pipeline. The jitted
        # step increments state.step by exactly 1, so a host counter seeded
        # once (resume-aware) stays in lockstep.
        step = int(jax.device_get(self.state.step))
        multiproc = jax.process_count() > 1
        # warm the snapshot jit OUTSIDE the timed loop (a fresh run always
        # saves at step 1 — reference cadence) so the first async save
        # doesn't pay a (minutes-long, over the tunnel) remote compile
        # inside a steady-state throughput window
        jax.block_until_ready(self._snapshot_fn(self.state))
        timing = self.timing
        pc = time.perf_counter
        t_last = pc()
        from lass_tpu.parallel.host import put_global_batch

        text_only = self.use_text_ratio >= 1.0
        wire = cfg.train.wire_dtype
        # per-step embed seed: deterministic AND resume-exact — a fresh
        # process's modality draws continue exactly where the killed run's
        # would have (a stateful rng stream would restart from zero)
        seed_base = cfg.train.random_seed * 1000003
        resume_step = step

        def prepare(i, batch):
            """Producer-thread half of the step (upload + state-free
            embed). Text-only conditioning embeds here too — it depends
            only on the batch; hybrid embeds on the main thread because
            it must see the MIXED segments (reference audiosep.py:77-88).
            """
            at = batch["audio_text"]
            waveform = _encode_wire(at["waveform"], wire)
            if text_only:
                t0 = pc()
                condition = self.query_encoder.get_query_embed(
                    "hybird", text=at["text"], audio=None,
                    use_text_ratio=self.use_text_ratio,
                    seed=seed_base + resume_step + i)
                timing["prefetch_embed"] += pc() - t0
                t0 = pc()
                # condition stays a DEVICE array in single-process runs
                # (np.asarray would block on the encoder's output);
                # multi-host assembly needs the local numpy shard
                data = put_global_batch(
                    {"waveform": waveform,
                     "condition": np.asarray(condition) if multiproc
                     else condition},
                    self.batch_shard)
                timing["prefetch_h2d"] += pc() - t0
                return data
            t0 = pc()
            dev_waveform = put_global_batch(
                {"waveform": waveform}, self.batch_shard)["waveform"]
            timing["prefetch_h2d"] += pc() - t0
            return dev_waveform, at["text"]

        with self.mesh:
            # resume-aware: skip the first `step` batches WITHOUT decoding,
            # so a resumed run replays the exact data sequence an
            # uninterrupted run would see at these steps (byte-exact
            # continuation — tested by the soak harness, scripts/soak.py)
            prefetch = _DevicePrefetcher(
                self.datamodule.train_dataloader(skip_batches=step), prepare)
            try:
                while True:
                    t0 = pc()
                    item = next(prefetch, None)
                    timing["data_wait"] += pc() - t0
                    if item is None:
                        break
                    t0 = pc()
                    if text_only:
                        self.state, metrics = self._step_fn(self.state, item,
                                                            rng)
                    else:
                        # hybrid: mix first (same fold_in(rng, step) key the
                        # fused path would use), embed the mixed segments,
                        # then step premixed
                        dev_waveform, text = item
                        mixtures, segments = self._mix_fn(dev_waveform, rng,
                                                          self.state.step)
                        condition = self.query_encoder.get_query_embed(
                            "hybird", text=text, audio=segments[:, 0],
                            use_text_ratio=self.use_text_ratio,
                            seed=seed_base + step)
                        data = {
                            "mixture": mixtures,
                            "segment": segments,
                            "condition": put_global_batch(
                                {"condition": np.asarray(condition)
                                 if multiproc else condition},
                                self.batch_shard)["condition"],
                        }
                        self.state, metrics = self._premixed_fn(self.state,
                                                                data)
                    step += 1
                    timing["dispatch"] += pc() - t0
                    if step % log_every == 0 or step == 1:
                        t0 = pc()
                        # one device_get for both scalars: each separate
                        # fetch pays a full tunnel round-trip (~29 ms)
                        loss, gnorm = map(float, jax.device_get(
                            (metrics["train_loss"], metrics["grad_norm"])))
                        timing["metrics_fetch"] += pc() - t0
                        dt = pc() - t_last
                        t_last = pc()
                        sps = log_every / dt if step > 1 else 1 / dt
                        logging.info("step %d loss %.5f (%.2f steps/s)",
                                     step, loss, sps)
                        self.metrics.log(step, {
                            "train_loss": loss,
                            "grad_norm": gnorm,
                            "steps_per_sec": sps,
                        })
                    if (eval_hook is not None
                            and step % cfg.train.evaluate_step_frequency
                            == 0):
                        t0 = pc()
                        eval_metrics = eval_hook(self, step)
                        if eval_metrics:
                            self.metrics.log(step, eval_metrics)
                            self.statistics.append(step, eval_metrics, "test")
                            logging.info("eval @ %d: %s", step, eval_metrics)
                        timing["eval"] += pc() - t0
                        t_last = pc()  # keep steps/s windows eval-free
                    if self.ckpt.should_save(step):
                        # non-blocking: snapshot on device (the step fns
                        # donate self.state — save_async docstring), fetch +
                        # write in the manager's saver thread while steps
                        # keep running
                        t0 = pc()
                        self.ckpt.save_async(step,
                                             self._snapshot_fn(self.state))
                        timing["save_block"] += pc() - t0
                    if step >= stop_at:
                        break
            finally:
                prefetch.close()
        self.ckpt.wait()
        self.metrics.finish()
        return self.state


def make_dcase_eval_hook(eval_indexes: str, audio_dir: str,
                         batch_size: int = 16):
    """Eval hook running the DCASE T9 harness on the training state."""
    from lass_tpu.evaluation.dcase import DCASEEvaluator, SeparationInference

    evaluator = DCASEEvaluator(eval_indexes=eval_indexes,
                               audio_dir=audio_dir, batch_size=batch_size)

    def hook(trainer: "Trainer", step: int):
        model = SeparationInference(
            trainer.task.model,
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats},
            trainer.query_encoder)
        sisdr, sdri, sdr = evaluator(model)
        return {"eval_SISDR": sisdr, "eval_SDRi": sdri, "eval_SDR": sdr}

    return hook


def _step_from_path(path: str) -> Optional[int]:
    """Accept either a checkpoint dir (latest) or .../<step>/ path."""
    name = pathlib.Path(path).name
    return int(name) if name.isdigit() else None
