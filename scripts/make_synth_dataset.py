"""CLI for lass_tpu.data.synth: fabricate a synthetic wav corpus +
datafile JSON (for sustained-training benchmarks on dataset-less boxes).

Usage: python scripts/make_synth_dataset.py --out /tmp/corpus --num 256
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--num", type=int, default=256)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--seconds_min", type=float, default=6.0)
    p.add_argument("--seconds_max", type=float, default=20.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from lass_tpu.data.synth import make_synth_corpus

    datafile = make_synth_corpus(
        args.out, num_clips=args.num, sample_rate=args.sample_rate,
        seconds_min=args.seconds_min, seconds_max=args.seconds_max,
        seed=args.seed)
    print(datafile)


if __name__ == "__main__":
    main()
