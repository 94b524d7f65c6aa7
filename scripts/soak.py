"""Multi-thousand-step training soak with a mid-run kill and resume
(VERDICT r4 item 4).

The reference's only published recipe is a 200k-step wall-clock run
(/root/reference/README.md:65); short benches don't prove the loop
survives hours, checkpoints under load, or resumes exactly. This harness:

1. spawns a REAL training run (synthetic corpus -> full host pipeline ->
   jitted step) with periodic checkpointing and a DCASE eval hook;
2. SIGKILLs it mid-run, after at least one post-checkpoint logging window
   (a crash, not a clean exit);
3. resumes from the latest checkpoint in a fresh process and runs to
   completion — the resumed loop fast-forwards the datamodule so it
   replays the exact batch sequence (train/loop.py skip_batches);
4. verifies: the overlapping logged steps (run A post-checkpoint vs run B
   replay) match BYTE-EXACT on train_loss, the loss curve is monotone-ish
   (last-quintile mean < first-quintile mean), steps/s is stable;
5. writes the loss/steps-per-sec trajectory + verdicts to SOAK_r05.json.

Run on the TPU (default env):  python scripts/soak.py --steps 3000
CPU smoke:  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/soak.py \
    --steps 200 --kill_after 40 --save_every 40 --eval_every 60 --tiny
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

# persistent compiled-executable cache (same dir as bench.py): run B's
# resume — a fresh process — reuses run A's compiles instead of re-paying
# them (tens of minutes on the 1-core CPU smoke, minutes over the tunnel)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_workspace(args):
    from lass_tpu.data.synth import make_synth_corpus, write_train_config

    os.makedirs(args.workspace, exist_ok=True)
    datafile = make_synth_corpus(
        os.path.join(args.workspace, "corpus"),
        num_clips=64 if args.tiny else 256)
    cfg = write_train_config(
        os.path.join(args.workspace, "soak.yaml"), datafile,
        batch_size=args.batch,
        segment_seconds=1.0 if args.tiny else 10.0,
        save_step_frequency=args.save_every,
        compute_dtype="float32" if args.tiny else "bfloat16",
        dsp_precision="default",
        wire_dtype=args.wire)
    return cfg


def make_eval_hook(args):
    """Tiny DCASE eval over pairs of synth-corpus clips (loss-curve
    sanity, exercises the eval-during-training path; random-weight model
    so the absolute SDR is meaningless, finiteness is the check)."""
    import csv as _csv

    import numpy as np

    from lass_tpu.audio.io import read_wav, write_wav
    from lass_tpu.evaluation.dcase import DCASEEvaluator, SeparationInference

    wav_dir = os.path.join(args.workspace, "corpus", "wavs")
    eval_dir = os.path.join(args.workspace, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    sr = 16000
    seg = int((1.0 if args.tiny else 10.0) * sr)
    names = sorted(os.listdir(wav_dir))[:8]
    csv_path = os.path.join(eval_dir, "eval.csv")
    with open(csv_path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["source", "noise", "snr", "caption"])
        for i in range(0, len(names) - 1, 2):
            for kind, name in (("src", names[i]), ("noise", names[i + 1])):
                wav, rate = read_wav(os.path.join(wav_dir, name))
                out = np.zeros((1, seg), np.float32)
                out[0, :min(seg, wav.shape[-1])] = wav[0, :seg]
                write_wav(os.path.join(eval_dir, f"{kind}{i}.wav"), out, sr)
            w.writerow([f"src{i}", f"noise{i}", "0", f"synthetic pair {i}"])

    evaluator = DCASEEvaluator(sr, csv_path, eval_dir, batch_size=4,
                               pad_seconds=1.0 if args.tiny else 10.0)

    def hook(trainer, step):
        model = SeparationInference(
            trainer.task.model,
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats},
            trainer.query_encoder)
        sisdr, sdri, sdr = evaluator(model)
        return {"eval_SISDR": sisdr, "eval_SDRi": sdri, "eval_SDR": sdr}

    return hook


def phase_train(args):
    """Child process: run (or resume) training to args.steps."""
    from lass_tpu.train.loop import Trainer

    cfg = build_workspace(args)
    resume = None
    if args.resume:
        import glob

        ckpt_dirs = glob.glob(os.path.join(
            args.workspace, "checkpoints", "train", "*"))
        assert ckpt_dirs, "resume requested but no checkpoint dir"
        resume = ckpt_dirs[0]
    trainer = Trainer(config_yaml=cfg, workspace=args.workspace,
                      resume_checkpoint_path=resume)
    trainer.cfg.train.evaluate_step_frequency = args.eval_every
    hook = make_eval_hook(args)
    trainer.fit(max_steps=args.steps, eval_hook=hook)
    print("phase_train done", json.dumps(trainer.timing))


def read_metrics(workspace):
    import glob

    paths = glob.glob(os.path.join(workspace, "tf_logs", "**",
                                   "metrics.jsonl"), recursive=True)
    records = []
    for p in paths:
        with open(p) as f:
            for line in f:
                try:
                    records.append(json.loads(line))
                except json.JSONDecodeError:
                    pass  # torn tail line from the SIGKILL
    return records


def finalized_ckpt_steps(workspace):
    import glob

    steps = []
    for d in glob.glob(os.path.join(workspace, "checkpoints", "train",
                                    "*", "*")):
        name = os.path.basename(d)
        if name.isdigit() and not glob.glob(os.path.join(d, "*.tmp*")):
            steps.append(int(name))
    return sorted(steps)


def split_runs(records):
    """Appended metrics from multiple runs: a step going backwards marks a
    new run."""
    runs, cur, last = [], [], None
    for r in records:
        if last is not None and r["step"] <= last:
            runs.append(cur)
            cur = []
        cur.append(r)
        last = r["step"]
    runs.append(cur)
    return runs


def orchestrate(args):
    t_start = time.time()
    child_cmd = [sys.executable, os.path.abspath(__file__),
                 "--phase", "train", "--steps", str(args.steps),
                 "--workspace", args.workspace, "--batch", str(args.batch),
                 "--save_every", str(args.save_every),
                 "--eval_every", str(args.eval_every),
                 "--wire", args.wire]
    if args.tiny:
        child_cmd.append("--tiny")

    # ---- run A: train until a finalized mid-run checkpoint exists AND at
    # least one post-checkpoint logging window landed, then SIGKILL ----
    os.makedirs(args.workspace, exist_ok=True)
    log_a = open(os.path.join(args.workspace, "runA.log"), "w")
    proc = subprocess.Popen(child_cmd, stdout=log_a, stderr=log_a)
    killed_at = resume_ckpt = None
    while proc.poll() is None:
        time.sleep(5)
        ckpts = [s for s in finalized_ckpt_steps(args.workspace)
                 if s >= args.kill_after]
        if not ckpts:
            continue
        recs = [r for r in read_metrics(args.workspace)
                if "train_loss" in r]
        if recs and recs[-1]["step"] >= ckpts[0] + 60:
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            killed_at = recs[-1]["step"]
            break
    if killed_at is None:
        raise SystemExit(f"run A exited early (rc={proc.returncode}) — "
                         f"see {args.workspace}/runA.log")
    resume_ckpt = finalized_ckpt_steps(args.workspace)[-1]
    print(f"run A killed after step {killed_at}; "
          f"latest finalized checkpoint: {resume_ckpt}")

    # ---- run B: resume to completion ----
    log_b = open(os.path.join(args.workspace, "runB.log"), "w")
    rc = subprocess.run(child_cmd + ["--resume"], stdout=log_b,
                        stderr=log_b).returncode
    if rc != 0:
        raise SystemExit(f"resume run failed rc={rc} — "
                         f"see {args.workspace}/runB.log")

    # ---- verify ----
    runs = split_runs(read_metrics(args.workspace))
    assert len(runs) >= 2, f"expected 2 runs in metrics, got {len(runs)}"
    run_a = {r["step"]: r for r in runs[0] if "train_loss" in r}
    run_b = {r["step"]: r for r in runs[-1] if "train_loss" in r}
    overlap = sorted(set(run_a) & set(run_b))
    resume_exact = bool(overlap) and all(
        run_a[s]["train_loss"] == run_b[s]["train_loss"] and
        run_a[s]["grad_norm"] == run_b[s]["grad_norm"] for s in overlap)

    losses = [(s, run_a[s]["train_loss"]) for s in sorted(run_a)] + \
        [(s, run_b[s]["train_loss"]) for s in sorted(run_b)
         if s not in run_a]
    losses.sort()
    vals = [v for _, v in losses]
    q = max(len(vals) // 5, 1)
    loss_decreasing = sum(vals[-q:]) / q < sum(vals[:q]) / q
    sps = [r["steps_per_sec"] for r in runs[-1]
           if "steps_per_sec" in r and r["step"] > overlap[0]] \
        if overlap else []
    evals = [r for rr in runs for r in rr if "eval_SDR" in r]

    out = {
        "steps": args.steps,
        "batch": args.batch,
        "killed_at_step": killed_at,
        "resumed_from_step": resume_ckpt,
        "overlap_steps_compared": overlap,
        "resume_byte_exact": resume_exact,
        "loss_first_quintile": round(sum(vals[:q]) / q, 6),
        "loss_last_quintile": round(sum(vals[-q:]) / q, 6),
        "loss_decreasing": loss_decreasing,
        "steps_per_sec_post_resume": [round(s, 3) for s in sps],
        "eval_records": [{k: round(v, 4) if isinstance(v, float) else v
                          for k, v in r.items() if k != "time"}
                         for r in evals],
        "loss_curve": [[s, round(v, 6)] for s, v in losses],
        "wall_seconds": round(time.time() - t_start, 1),
    }
    path = os.path.join(REPO, "SOAK_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "loss_curve"},
                     indent=1))
    assert resume_exact, "post-resume metrics NOT byte-exact"
    print(f"SOAK OK -> {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["orchestrate", "train"],
                    default="orchestrate")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--kill_after", type=int, default=None,
                    help="kill run A once logged step passes this+60 "
                    "(default: steps//2)")
    ap.add_argument("--workspace", default="/tmp/lass_soak")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--save_every", type=int, default=500)
    ap.add_argument("--eval_every", type=int, default=1000)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="1 s segments + float32 (CPU smoke)")
    ap.add_argument("--wire", default="float32",
                    choices=["float32", "int16"],
                    help="train.wire_dtype — int16 is the production TPU "
                    "setting (halves host->device bytes; config.py); the "
                    "soak then ALSO proves resume-exactness on that path")
    args = ap.parse_args()
    if args.kill_after is None:
        args.kill_after = args.steps // 2
    if args.phase == "orchestrate":
        # the kill waits for a finalized checkpoint >= kill_after PLUS one
        # 60-step logging window; with defaults tuned for a 3000-step run,
        # a short smoke needs --save_every/--eval_every scaled down too
        first_ckpt = -(-args.kill_after // args.save_every) * args.save_every
        if first_ckpt + 60 >= args.steps:
            raise SystemExit(
                f"no room to kill run A: first eligible checkpoint is at "
                f"step {first_ckpt} (save_every={args.save_every}, "
                f"kill_after={args.kill_after}) and the harness waits one "
                f"more 60-step window, but --steps is {args.steps}")
    if args.phase == "train":
        phase_train(args)
    else:
        orchestrate(args)


if __name__ == "__main__":
    main()
