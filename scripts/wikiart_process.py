"""Flatten a WikiArt dump into the train/test style-image layout the style
datasets expect (port of src/scripts/wikiart_process.py).

Usage:
  python scripts/wikiart_process.py --input <wikiart_root> --output <out_root> \
      [--test-fraction 0.05] [--seed 0]
"""

import argparse
import random
import shutil
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--test-fraction", type=float, default=0.05)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = random.Random(args.seed)
    images = sorted(
        p for p in Path(args.input).rglob("*")
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    rng.shuffle(images)
    n_test = int(len(images) * args.test_fraction)
    splits = {"test": images[:n_test], "train": images[n_test:]}
    for stage, paths in splits.items():
        out_dir = Path(args.output) / stage
        out_dir.mkdir(parents=True, exist_ok=True)
        for p in paths:
            # Flatten with genre-prefixed unique names.
            name = f"{p.parent.name}_{p.name}" if p.parent != Path(args.input) else p.name
            shutil.copyfile(p, out_dir / name)
        print(f"{stage}: {len(paths)} images -> {out_dir}")


if __name__ == "__main__":
    main()
