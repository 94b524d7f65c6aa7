"""Re-root FSD50K caption JSONs into datafiles.

Behavioral spec: reference scripts/create_fsd50k_datafiles.py — rewrite
each entry's wav to a relative processed-audio path; paths are CLI args.

    python scripts/create_fsd50k_datafiles.py --captions_dir CAPS \
        --audio_prefix processed_data_files/fsd50k --output_dir datafiles
"""
import argparse
import json
import os

SPLITS = {
    "dev": ("fsd50k_dev_captions.json", "dev_audio"),
    "eval": ("fsd50k_eval_captions.json", "eval_audio"),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--captions_dir", required=True)
    parser.add_argument("--audio_prefix",
                        default="processed_data_files/fsd50k")
    parser.add_argument("--output_dir", default="datafiles")
    args = parser.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    for split, (fname, audio_sub) in SPLITS.items():
        src = os.path.join(args.captions_dir, fname)
        if not os.path.isfile(src):
            print(f"skip {split}: {src} not found")
            continue
        with open(src) as f:
            data = json.load(f)
        for item in data["data"]:
            item["wav"] = (f"{args.audio_prefix}/{audio_sub}/"
                           f"{os.path.basename(item['wav'])}")
        out = os.path.join(args.output_dir, f"fsd50k_{split}.json")
        with open(out, "w") as f:
            json.dump(data, f, indent=4)
        print(f"Created {out} with {len(data['data'])} entries")


if __name__ == "__main__":
    main()
