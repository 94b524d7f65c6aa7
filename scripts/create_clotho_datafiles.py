"""Build Clotho datafiles JSON from caption CSVs.

Behavioral spec: reference scripts/create_clotho_datafiles.py — one entry
per (wav, caption_i) pair for captions 1..5, relative wav paths under the
processed-audio dir. Paths are arguments here instead of hardcoded
/scratch/$USER locations.

    python scripts/create_clotho_datafiles.py --csv_dir CSVS \
        --audio_prefix processed_data_files/clotho --output_dir datafiles
"""
import argparse
import csv
import json
import os

SPLITS = {
    "development": "clotho_captions_development.csv",
    "validation": "clotho_captions_validation.csv",
    "evaluation": "clotho_captions_evaluation.csv",
}


def build_split(csv_path: str, split: str, audio_prefix: str) -> list:
    data = []
    with open(csv_path, newline="", encoding="utf-8-sig") as f:
        for row in csv.DictReader(f):
            wav = f"{audio_prefix}/{split}/{row['file_name']}"
            for i in range(1, 6):
                caption = (row.get(f"caption_{i}") or "").strip()
                if caption:
                    data.append({"wav": wav, "caption": caption})
    return data


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv_dir", required=True)
    parser.add_argument("--audio_prefix",
                        default="processed_data_files/clotho")
    parser.add_argument("--output_dir", default="datafiles")
    args = parser.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    for split, csv_name in SPLITS.items():
        csv_path = os.path.join(args.csv_dir, csv_name)
        if not os.path.isfile(csv_path):
            print(f"skip {split}: {csv_path} not found")
            continue
        data = build_split(csv_path, split, args.audio_prefix)
        out = os.path.join(args.output_dir, f"clotho_{split}.json")
        with open(out, "w") as f:
            json.dump({"data": data}, f, indent=4)
        print(f"Created {out} with {len(data)} entries")


if __name__ == "__main__":
    main()
