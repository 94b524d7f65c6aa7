"""Print schema/shapes/dtypes of a precomputed batch file (the reference's
scripts/inspect_batch_pt.py:6-57 for npz batches).

    python scripts/inspect_batch.py precomputed/batch_000000.npz
"""
import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path")
    parser.add_argument("--item", type=int, default=0,
                        help="item index to summarize")
    args = parser.parse_args()

    with np.load(args.path, allow_pickle=False) as z:
        keys = sorted(z.files)
        n = z["target_waveform"].shape[0]
        print(f"{args.path}: {n} items, {len(keys)} arrays")
        for k in keys:
            a = z[k]
            print(f"  {k:34s} shape={tuple(a.shape)} dtype={a.dtype}")
        i = args.item
        print(f"\nitem {i}:")
        print(f"  text: {z['text'][i]!r}")
        print(f"  mixture_component_texts: "
              f"{[t for t in z['mixture_component_texts'][i] if t]!r}")
        tw = z["target_waveform"][i]
        print(f"  target_waveform: shape={tw.shape} "
              f"rms={np.sqrt(np.mean(tw**2)):.5f} "
              f"peak={np.abs(tw).max():.5f}")


if __name__ == "__main__":
    main()
