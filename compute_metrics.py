"""Offline metric computation over saved render directories
(port of the reference's src/scripts/compute_metrics.py + MetricComputer):
compare one or more method output dirs against ground-truth images.

Usage:
  python compute_metrics.py --gt-dir <gt_images> --pred-dir <method1> [--pred-dir <method2> ...]

Directories are matched by relative file path (any nesting); images are
compared at the GT resolution.
"""

import argparse
from pathlib import Path


def collect_images(root: Path):
    exts = {".png", ".jpg", ".jpeg"}
    return {
        str(p.relative_to(root)): p
        for p in sorted(root.rglob("*"))
        if p.suffix.lower() in exts
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--gt-dir", required=True)
    parser.add_argument("--pred-dir", action="append", required=True)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from styl3r_tpu.eval.metrics import MetricTracker, compute_psnr, compute_ssim

    gt = collect_images(Path(args.gt_dir))
    if not gt:
        raise SystemExit(f"no images under {args.gt_dir}")

    def load(path, size=None):
        with Image.open(path) as img:
            img = img.convert("RGB")
            if size is not None and img.size != size:
                img = img.resize(size, Image.LANCZOS)
            return np.asarray(img, np.float32) / 255.0

    results = {}
    for pred_dir in args.pred_dir:
        preds = collect_images(Path(pred_dir))
        common = sorted(set(gt) & set(preds))
        if not common:
            print(f"{pred_dir}: no matching files")
            continue
        tracker = MetricTracker()
        for rel in common:
            g = load(gt[rel])
            p = load(preds[rel], size=(g.shape[1], g.shape[0]))
            tracker.update(
                {
                    "psnr": float(compute_psnr(jnp.asarray(g), jnp.asarray(p))),
                    "ssim": float(compute_ssim(jnp.asarray(g)[None], jnp.asarray(p)[None])[0]),
                }
            )
        means = tracker.means()
        results[pred_dir] = means
        print(
            f"{pred_dir} ({len(common)} images): "
            + " ".join(f"{k.split('/')[0]}={v:.4f}" for k, v in means.items() if k.endswith("/all"))
        )
    return results


if __name__ == "__main__":
    main()
