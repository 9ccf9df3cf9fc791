"""Generate the random scene -> style-image mapping JSON used by the style
datasets (port of src/test/generate_scene_style_correspondences*.py).

Usage:
  python scripts/generate_scene_style_mapping.py --data-root <re10k_root> \
      --style-root <wikiart_root> [--stage train] [--seed 0]
"""

import argparse
import json
import random
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-root", action="append", required=True)
    parser.add_argument("--style-root", required=True)
    parser.add_argument("--stage", default="train")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = random.Random(args.seed)
    style_dir = Path(args.style_root) / "train"
    styles = sorted(
        p.name for p in style_dir.iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    if not styles:
        raise SystemExit(f"no style images in {style_dir}")

    scenes = []
    for root in args.data_root:
        with (Path(root) / args.stage / "index.json").open() as f:
            scenes.extend(json.load(f).keys())

    mapping = {scene: rng.choice(styles) for scene in scenes}
    out = style_dir / "scene_style_mapping_all.json"
    out.write_text(json.dumps(mapping))
    print(f"{len(mapping)} scenes -> {len(styles)} styles: {out}")


if __name__ == "__main__":
    main()
