"""Chunked dataset ingestion.

The reference stores RE10K/DL3DV as chunked `.torch` files — each a torch-saved
list of {key, cameras (n, 18) fp32, images: list of JPEG byte tensors, url}
(`src/dataset/dataset_re10k_style.py:107-121,218-236`). We read those directly
(torch CPU is available) and also support a converted `.npz` layout for
torch-free, memory-mapped ingestion.

Camera packing (18 floats/frame): fx, fy, cx, cy, 0, 0, then a 3x4 w2c matrix
row-major; convert_poses returns c2w 4x4 + normalized K.
"""

from __future__ import annotations

import io
import json
from pathlib import Path
from typing import Dict, Iterator, List, Tuple

import numpy as np


def convert_poses_re10k(poses: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(n, 18) packed cameras -> (c2w (n,4,4), K (n,3,3))."""
    n = poses.shape[0]
    intrinsics = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    fx, fy, cx, cy = poses[:, 0], poses[:, 1], poses[:, 2], poses[:, 3]
    intrinsics[:, 0, 0] = fx
    intrinsics[:, 1, 1] = fy
    intrinsics[:, 0, 2] = cx
    intrinsics[:, 1, 2] = cy

    w2c = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    w2c[:, :3] = poses[:, 6:].reshape(n, 3, 4)
    c2w = np.linalg.inv(w2c)
    return c2w.astype(np.float32), intrinsics


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w, 3) float32 in [0, 1]."""
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True  # reference tolerates bad DL3DV jpegs
    with Image.open(io.BytesIO(data)) as img:
        arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def load_chunk(path: Path) -> List[Dict]:
    """Load one chunk: returns a list of examples with numpy cameras and raw
    jpeg bytes per frame."""
    path = Path(path)
    if path.suffix == ".torch":
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        out = []
        for ex in raw:
            images = [
                bytes(im.numpy().tobytes()) if hasattr(im, "numpy") else bytes(im)
                for im in ex["images"]
            ]
            out.append(
                {
                    "key": ex["key"],
                    "cameras": np.asarray(ex["cameras"], dtype=np.float32),
                    "images": images,
                }
            )
        return out
    if path.suffix == ".npz":
        data = np.load(path, allow_pickle=True)
        return list(data["examples"])
    raise ValueError(f"unknown chunk format: {path}")


def load_index(root: Path, stage: str) -> Dict[str, Path]:
    """scene key -> chunk path, from the per-stage index.json."""
    root = Path(root)
    with (root / stage / "index.json").open() as f:
        index = json.load(f)
    return {k: root / stage / v for k, v in index.items()}


def list_chunks(roots: List[Path], stage: str) -> List[Path]:
    chunks: List[Path] = []
    for root in roots:
        stage_dir = Path(root) / stage
        chunks.extend(
            sorted(p for p in stage_dir.iterdir() if p.suffix in (".torch", ".npz"))
        )
    return chunks


def iter_chunk_examples(chunk_path: Path) -> Iterator[Dict]:
    yield from load_chunk(chunk_path)
