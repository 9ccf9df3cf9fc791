"""Convert a DL3DV-style scene tree (transforms.json + images) into the
chunked .torch dataset layout (port of the reference's
src/scripts/convert_dl3dv.py): per scene, pack cameras as the 18-float rows
(fx fy cx cy 0 0 + 3x4 w2c, OpenGL -> OpenCV) and images as JPEG bytes;
group scenes into ~`chunk_size_mb` chunks and write index.json.

Usage:
  python scripts/convert_dl3dv.py --input <dl3dv_root> --output <out_root> \
      --stage train [--chunk-size-mb 256]
"""

import argparse
import io
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def convert_scene(scene_dir: Path):
    import torch
    from PIL import Image

    with (scene_dir / "transforms.json").open() as f:
        meta = json.load(f)

    frames = sorted(meta["frames"], key=lambda fr: fr["file_path"])
    w, h = meta.get("w"), meta.get("h")
    fx, fy = meta.get("fl_x"), meta.get("fl_y")
    cx, cy = meta.get("cx"), meta.get("cy")

    cameras, images = [], []
    for fr in frames:
        img_path = scene_dir / fr["file_path"]
        if not img_path.exists():
            continue
        c2w_gl = np.asarray(fr["transform_matrix"], np.float64)
        # OpenGL (y up, z back) -> OpenCV (y down, z forward): negate cols 1,2.
        c2w = c2w_gl.copy()
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1
        w2c = np.linalg.inv(c2w)
        row = np.zeros(18, np.float32)
        row[0], row[1] = fx / w, fy / h
        row[2], row[3] = cx / w, cy / h
        row[6:] = w2c[:3].reshape(-1)
        cameras.append(row)
        with Image.open(img_path) as im:
            buf = io.BytesIO()
            im.convert("RGB").save(buf, format="JPEG", quality=95)
        images.append(torch.frombuffer(bytearray(buf.getvalue()), dtype=torch.uint8))
    if not cameras:
        return None
    return {
        "key": scene_dir.name,
        "cameras": torch.from_numpy(np.stack(cameras)),
        "images": images,
        "url": "",
    }


def main():
    import torch

    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--stage", default="train")
    parser.add_argument("--chunk-size-mb", type=int, default=256)
    args = parser.parse_args()

    out_dir = Path(args.output) / args.stage
    out_dir.mkdir(parents=True, exist_ok=True)
    scene_dirs = sorted(
        p for p in Path(args.input).iterdir()
        if p.is_dir() and (p / "transforms.json").exists()
    )
    index, chunk, chunk_bytes, chunk_id = {}, [], 0, 0

    def flush():
        nonlocal chunk, chunk_bytes, chunk_id
        if not chunk:
            return
        name = f"{chunk_id:06d}.torch"
        torch.save(chunk, out_dir / name)
        for ex in chunk:
            index[ex["key"]] = name
        print(f"wrote {name}: {len(chunk)} scenes, {chunk_bytes/1e6:.0f} MB")
        chunk, chunk_bytes, chunk_id = [], 0, chunk_id + 1

    for sd in scene_dirs:
        ex = convert_scene(sd)
        if ex is None:
            continue
        size = sum(im.numel() for im in ex["images"])
        chunk.append(ex)
        chunk_bytes += size
        if chunk_bytes > args.chunk_size_mb * 1e6:
            flush()
    flush()
    (out_dir / "index.json").write_text(json.dumps(index))
    print(f"index: {len(index)} scenes -> {out_dir}")


if __name__ == "__main__":
    main()
