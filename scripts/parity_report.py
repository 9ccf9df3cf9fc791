"""One-command checkpoint parity report.

Given a released reference checkpoint (e.g. re10k_2v.ckpt) and an RE10K chunk
root, runs the frozen evaluation index protocol (reference mode=test,
model_wrapper_style.py:317-469) and emits the PSNR/SSIM(/LPIPS when weights
are configured) table plus benchmark.json / peak_memory.json — so the moment
real weights are available, the "within 1% of the reference" claim is
testable with:

  python scripts/parity_report.py --checkpoint re10k_2v.ckpt \
      --data-root datasets/re10k [--lpips lpips.pth --lpips-vgg16 vgg16.pth] \
      [--max-scenes 50] [--output outputs/parity]

The report JSON carries per-overlap-bucket means in the reference's format
(psnr/ssim/lpips x all/small/large) for a line-by-line diff against the
paper's Table 1 / the reference's own scores.json.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True, help=".ckpt/.pth or orbax dir")
    parser.add_argument("--data-root", default="datasets/re10k")
    parser.add_argument("--index", default="assets/evaluation_index_re10k.json")
    parser.add_argument("--lpips", default="", help="lpips lin-weights state dict")
    parser.add_argument("--lpips-vgg16", default="", help="torchvision vgg16 state dict")
    parser.add_argument("--max-scenes", type=int, default=None)
    parser.add_argument("--output", default="outputs/parity")
    parser.add_argument("--align-pose", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--tiny", action="store_true", help="tiny trunk (smoke test)")
    args = parser.parse_args(argv)

    overrides = [
        f"datasets.0.roots=[{args.data_root}]",
        f"datasets.0.view_sampler.index_path={args.index}",
        f"test.output_path={args.output}",
        f"test.align_pose={str(args.align_pose).lower()}",
    ]
    if args.lpips and args.lpips_vgg16:
        overrides += [
            f"losses.lpips_weights={args.lpips}",
            f"losses.lpips_vgg16_weights={args.lpips_vgg16}",
            "losses.lpips=1.0",
        ]

    import evaluate

    eval_args = ["--config", "configs/experiment/re10k_eval.yaml",
                 "--checkpoint", args.checkpoint]
    if args.max_scenes:
        eval_args += ["--max-scenes", str(args.max_scenes)]
    if args.cpu:
        eval_args += ["--cpu"]
    if args.tiny:
        eval_args += ["--tiny"]
    means = evaluate.main(eval_args + overrides)

    report = {
        "checkpoint": args.checkpoint,
        "index": args.index,
        "scores": means,
        "reference_targets": {
            # Styl3R paper / reference README headline numbers (2-view RE10K
            # NVS) for eyeballing; authoritative numbers come from running the
            # reference itself on the same index.
            "note": "compare scores.psnr/all against the reference checkpoint's "
                    "scores.json on the same evaluation index",
        },
    }
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    with (out / "parity_report.json").open("w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["scores"], indent=2))
    print(f"report -> {out / 'parity_report.json'} (+ scores.json, benchmark.json)")


if __name__ == "__main__":
    main()
