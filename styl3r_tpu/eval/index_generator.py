"""Evaluation index generation.

Equivalent of `src/evaluation/evaluation_index_generator.py`: pick, per scene,
a deterministic context pair whose view overlap falls in a target band, plus
evenly spaced target views between them; emit the
`assets/evaluation_index_*.json` format ({scene: {context, target, overlap}
or null}).

Overlap here is measured geometrically (no model needed): the fraction of
view-A rays, probed at a range of depths, that land inside view B — a
frustum-overlap proxy for the reference's estimate.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from ..geometry.projection import (
    get_world_rays,
    project,
    sample_image_grid,
)

import jax.numpy as jnp


def view_overlap(
    ext_a: np.ndarray, ext_b: np.ndarray, k_a: np.ndarray, k_b: np.ndarray,
    probe_depths: Sequence[float] = (0.5, 1.0, 2.0, 4.0),
    grid: int = 8,
) -> float:
    """Fraction of view-A probe points visible in view B (averaged over
    probe depths)."""
    coords, _ = sample_image_grid((grid, grid))
    origins, dirs = get_world_rays(
        jnp.asarray(coords), jnp.asarray(ext_a), jnp.asarray(k_a)
    )
    total = 0.0
    for d in probe_depths:
        pts = origins + dirs * d
        xy, in_front = project(pts, jnp.asarray(ext_b), jnp.asarray(k_b))
        inside = (
            in_front
            & (xy[..., 0] >= 0) & (xy[..., 0] <= 1)
            & (xy[..., 1] >= 0) & (xy[..., 1] <= 1)
        )
        total += float(jnp.mean(inside.astype(jnp.float32)))
    return total / len(probe_depths)


def overlap_tag(overlap: float) -> str:
    if overlap < 0.3:
        return "small"
    if overlap <= 0.55:
        return "medium"
    return "large"


def generate_scene_entry(
    extrinsics: np.ndarray,
    intrinsics: np.ndarray,
    num_targets: int = 3,
    min_overlap: float = 0.25,
    max_overlap: float = 0.75,
    min_gap: int = 30,
    max_gap: int = 120,
    rng: Optional[np.random.Generator] = None,
) -> Optional[Dict]:
    """Pick a context pair in the overlap band; None if the scene has none."""
    rng = rng or np.random.default_rng(0)
    n = len(extrinsics)
    candidates = []
    gaps = [g for g in range(min_gap, min(max_gap, n - 1) + 1, max(1, (max_gap - min_gap) // 8))]
    for gap in gaps:
        for _ in range(4):
            left = int(rng.integers(0, n - gap))
            right = left + gap
            ov = view_overlap(
                extrinsics[left], extrinsics[right], intrinsics[left], intrinsics[right]
            )
            candidates.append((left, right, ov))
            if min_overlap <= ov <= max_overlap:
                targets = np.linspace(left, right, num_targets + 2)[1:-1]
                return {
                    "context": [left, right],
                    "target": [int(t) for t in targets.round()],
                    "overlap": overlap_tag(ov),
                }
    return None


def generate_evaluation_index(
    scenes: Dict[str, Dict],
    output_path: Path,
    seed: int = 0,
    **kwargs,
) -> Dict:
    """scenes: {key: {'extrinsics': (n,4,4), 'intrinsics': (n,3,3)}} ->
    writes + returns the evaluation index."""
    rng = np.random.default_rng(seed)
    index = {}
    for key, data in scenes.items():
        index[key] = generate_scene_entry(
            np.asarray(data["extrinsics"]), np.asarray(data["intrinsics"]),
            rng=rng, **kwargs,
        )
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with output_path.open("w") as f:
        json.dump(index, f)
    return index
