"""RE10K/DL3DV-style streaming dataset + batch collation.

Equivalent of `DatasetRE10kStyle` (`src/dataset/dataset_re10k_style.py`):
iterate shuffled chunks, sample context/target views, decode JPEGs, filter
(FOV <= max_fov, baseline in range, image shape), rescale world to baseline 1,
canonicalize poses to context camera 0, attach a style image, flip-augment,
rescale+center-crop to the input shape.

Host-side and numpy-only by design: the TPU step consumes collated
fixed-shape Batch pytrees; a background thread pool overlaps decode with
device compute (the reference uses 16 DataLoader worker processes — JPEG
decode in PIL releases the GIL, so threads suffice here, and the C++ loader
in styl3r_tpu/native takes over the hot decode path when built).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .chunks import convert_poses_re10k, decode_jpeg, list_chunks
from .shims import apply_augmentation, prepare_style_image, rescale_and_crop
from .types import Example, Views
from ..geometry.projection import get_fov


@dataclass
class DatasetConfig:
    roots: Sequence[Path]
    style_root: Optional[Path] = None
    input_image_shape: tuple = (256, 256)
    original_image_shape: tuple = (360, 640)
    baseline_min: float = 1e-3
    baseline_max: float = 1e2
    max_fov: float = 100.0
    make_baseline_1: bool = True
    relative_pose: bool = True
    augment: bool = True
    skip_bad_shape: bool = True
    near: float = 0.1
    far: float = 100.0
    overfit_to_scene: Optional[str] = None
    specified_style_image: Optional[Path] = None


class RE10kStyleDataset:
    def __init__(
        self,
        cfg: DatasetConfig,
        stage: str,
        view_sampler,
        seed: int = 0,
        step_fn: Callable[[], int] = lambda: 0,
        shard_id: Optional[int] = None,
        num_shards: Optional[int] = None,
    ):
        self.cfg = cfg
        self.stage = stage
        self.view_sampler = view_sampler
        self.step_fn = step_fn

        # Multi-host input sharding: each host reads a disjoint chunk subset
        # (the reference's per-rank DataLoader seeding maps to per-host shards
        # + per-host RNG here; SURVEY.md section 2.8).
        if shard_id is None or num_shards is None:
            try:
                import jax

                shard_id = jax.process_index()
                num_shards = jax.process_count()
            except Exception:
                shard_id, num_shards = 0, 1
        self.shard_id, self.num_shards = shard_id, num_shards
        self.rng = np.random.default_rng(seed + 7919 * shard_id)

        data_stage = "test" if stage in ("val", "test") else "train"
        if cfg.overfit_to_scene is not None:
            data_stage = "test"
        chunks = list_chunks(list(cfg.roots), data_stage)
        if num_shards > 1:
            chunks = chunks[shard_id::num_shards] or chunks
        self.chunks = chunks

        self.scene_style_mapping: Dict[str, str] = {}
        if cfg.style_root is not None and cfg.specified_style_image is None:
            mapping = Path(cfg.style_root) / "train" / "scene_style_mapping_all.json"
            if mapping.exists():
                with mapping.open() as f:
                    self.scene_style_mapping = json.load(f)

    # -- style ------------------------------------------------------------

    def _read_style_image(self, scene: str) -> tuple[np.ndarray, str]:
        from PIL import Image

        if self.cfg.specified_style_image is not None:
            path = Path(self.cfg.specified_style_image)
        else:
            name = self.scene_style_mapping.get(scene)
            if name is None:
                raise KeyError(f"{scene} not in scene_style_mapping")
            path = Path(self.cfg.style_root) / "train" / name
        with Image.open(path) as img:
            arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
        return prepare_style_image(arr, 256, self.stage, self.rng), path.name

    # -- iteration --------------------------------------------------------

    def __iter__(self) -> Iterator[Example]:
        chunks = list(self.chunks)
        if self.stage in ("train", "val"):
            self.rng.shuffle(chunks)
        for chunk_path in chunks:
            from .chunks import load_chunk

            chunk = load_chunk(chunk_path)
            if self.cfg.overfit_to_scene is not None:
                chunk = [ex for ex in chunk if ex["key"] == self.cfg.overfit_to_scene] * max(
                    len(chunk), 1
                )
            if self.stage in ("train", "val"):
                self.rng.shuffle(chunk)
            for raw in chunk:
                example = self._build_example(raw)
                if example is not None:
                    yield example

    def _build_example(self, raw: Dict) -> Optional[Example]:
        extrinsics, intrinsics = convert_poses_re10k(raw["cameras"])
        scene = raw["key"]
        try:
            sampled = self.view_sampler.sample(
                scene, len(extrinsics), self.rng, self.step_fn()
            )
        except ValueError:
            return None

        fov_deg = np.degrees(np.asarray(get_fov(intrinsics)))
        if (fov_deg > self.cfg.max_fov).any():
            return None

        try:
            jpegs = [raw["images"][i] for i in sampled.context] + [
                raw["images"][i] for i in sampled.target
            ]
        except IndexError:
            return None

        decoded = None
        expect = tuple(self.cfg.original_image_shape)
        try:
            # Native batched decode (threaded libjpeg + Lanczos); off-size
            # frames are resized to the canonical shape rather than skipped.
            from ..native import decode_jpeg_batch

            decoded = decode_jpeg_batch(jpegs, expect)
        except Exception:
            decoded = None
        if decoded is not None:
            ctx_imgs = decoded[: len(sampled.context)]
            tgt_imgs = decoded[len(sampled.context) :]
        else:
            try:
                ctx_imgs = np.stack(
                    [decode_jpeg(raw["images"][i]) for i in sampled.context]
                )
                tgt_imgs = np.stack(
                    [decode_jpeg(raw["images"][i]) for i in sampled.target]
                )
            except (IndexError, OSError):
                return None
            if self.cfg.skip_bad_shape:
                if ctx_imgs.shape[1:3] != expect or tgt_imgs.shape[1:3] != expect:
                    return None

        scale = 1.0
        if self.cfg.make_baseline_1:
            a = extrinsics[sampled.context[0], :3, 3]
            b = extrinsics[sampled.context[-1], :3, 3]
            scale = float(np.linalg.norm(a - b))
            if scale < self.cfg.baseline_min or scale > self.cfg.baseline_max:
                return None
            extrinsics = extrinsics.copy()
            extrinsics[:, :3, 3] /= scale

        if self.cfg.relative_pose:
            pivot = extrinsics[sampled.context[0]]
            extrinsics = np.linalg.inv(pivot)[None] @ extrinsics

        if self.scene_style_mapping or self.cfg.specified_style_image:
            style_image, style_name = self._read_style_image(scene)
        else:
            # NVS pretraining: style := context view 0 (applied downstream);
            # placeholder keeps batch shapes static.
            style_image, style_name = np.zeros((256, 256, 3), np.float32), ""

        def make_views(indices, images):
            n = len(indices)
            return Views(
                extrinsics=extrinsics[indices].astype(np.float32),
                intrinsics=intrinsics[indices].astype(np.float32),
                image=images.astype(np.float32),
                near=np.full((n,), self.cfg.near / scale, np.float32),
                far=np.full((n,), self.cfg.far / scale, np.float32),
                index=np.asarray(indices, np.int64),
                overlap=np.asarray([sampled.overlap], np.float32),
            )

        example = Example(
            context=make_views(sampled.context, ctx_imgs),
            target=make_views(sampled.target, tgt_imgs),
            scene=scene,
            style_image=style_image,
            style_name=style_name,
        )
        if self.stage == "train" and self.cfg.augment:
            example = apply_augmentation(example, self.rng)

        # Final rescale + center-crop with intrinsics fixup.
        shape = tuple(self.cfg.input_image_shape)
        ctx_im, ctx_k = rescale_and_crop(
            example.context.image, example.context.intrinsics, shape
        )
        tgt_im, tgt_k = rescale_and_crop(
            example.target.image, example.target.intrinsics, shape
        )
        example.context.image, example.context.intrinsics = ctx_im, ctx_k
        example.target.image, example.target.intrinsics = tgt_im, tgt_k
        return example


def collate_examples(examples: List[Example]):
    """Stack host examples into a device-ready Batch (styl3r.Batch)."""
    from ..models.styl3r import Batch

    return Batch(
        context_images=np.stack([e.context.image for e in examples]),
        context_intrinsics=np.stack([e.context.intrinsics for e in examples]),
        target_extrinsics=np.stack([e.target.extrinsics for e in examples]),
        target_intrinsics=np.stack([e.target.intrinsics for e in examples]),
        target_near=np.stack([e.target.near for e in examples]),
        target_far=np.stack([e.target.far for e in examples]),
        style_image=np.stack([e.style_image for e in examples]),
        target_images=np.stack([e.target.image for e in examples]),
    )


def batch_iterator(
    dataset: RE10kStyleDataset,
    batch_size: int,
    prefetch: int = 2,
    drop_last: bool = True,
    aspect_buckets: bool = False,
) -> Iterator:
    """Batched iterator with background prefetch: decode overlaps device
    compute via a producer thread + bounded queue.

    With `aspect_buckets`, examples are grouped by image shape before
    collation, so a mixed landscape/portrait stream yields shape-homogeneous
    batches (one jitted graph per bucket) — the XLA-native equivalent of the
    reference's per-sample ManyAR_PatchEmbed mixed batches
    (croco/patch_embed.py:33-75)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))

    def producer():
        buckets: dict = {}
        try:
            for ex in dataset:
                key = tuple(ex.context.image.shape[1:3]) if aspect_buckets else None
                buf = buckets.setdefault(key, [])
                buf.append(ex)
                if len(buf) == batch_size:
                    q.put(collate_examples(buf))
                    buckets[key] = []
            if not drop_last:
                for buf in buckets.values():
                    if buf:
                        q.put(collate_examples(buf))
        finally:
            q.put(None)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        batch = q.get()
        if batch is None:
            break
        yield batch
