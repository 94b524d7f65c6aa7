"""Resample a corpus to 16 kHz mono with -3 dBFS peak normalization.

Behavioral spec: reference scripts/process_audio.sh:31-52 (sox -r 16000
-c 1 gain -n -3, parallel jobs). This environment has no sox; the same
transform runs on the lass_tpu codec + sinc resampler with a process pool.

    python scripts/process_audio.py --input_dir IN --output_dir OUT \
        [--rate 16000] [--gain_dbfs -3] [--jobs 8]
"""
import argparse
import os
from concurrent.futures import ProcessPoolExecutor


def process_one(job):
    src, dst, rate, gain_dbfs = job
    import numpy as np

    from lass_tpu.audio.io import read_wav, write_wav
    from lass_tpu.audio.resample import resample_np

    try:
        audio, sr = read_wav(src)
        mono = audio.mean(axis=0) if audio.shape[0] > 1 else audio[0]
        if sr != rate:
            mono = resample_np(mono, sr, rate)
        peak = np.abs(mono).max()
        if peak > 0:
            mono = mono * (10 ** (gain_dbfs / 20.0) / peak)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        write_wav(dst, mono[None, :], rate, bits=16)
        return None
    except Exception as exc:  # keep the sweep going; report at the end
        return f"{src}: {exc}"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--rate", type=int, default=16000)
    parser.add_argument("--gain_dbfs", type=float, default=-3.0)
    parser.add_argument("--jobs", type=int, default=os.cpu_count())
    args = parser.parse_args()

    jobs = []
    for root, _dirs, files in os.walk(args.input_dir):
        for name in files:
            if not name.lower().endswith(".wav"):
                continue
            src = os.path.join(root, name)
            rel = os.path.relpath(src, args.input_dir)
            jobs.append((src, os.path.join(args.output_dir, rel),
                         args.rate, args.gain_dbfs))

    errors = []
    with ProcessPoolExecutor(max_workers=args.jobs) as pool:
        for err in pool.map(process_one, jobs, chunksize=8):
            if err:
                errors.append(err)
    print(f"processed {len(jobs) - len(errors)}/{len(jobs)} files")
    for e in errors[:20]:
        print("  ERROR", e)


if __name__ == "__main__":
    main()
