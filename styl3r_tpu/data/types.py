"""Host-side data types (numpy; device transfer happens at the batch level).

Mirrors the reference batch contract (`src/dataset/types.py:17-29`):
BatchedExample = {context, target, scene, style}.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Literal, Optional

import numpy as np

Stage = Literal["train", "val", "test"]


@dataclass
class Views:
    extrinsics: np.ndarray  # (v, 4, 4) c2w
    intrinsics: np.ndarray  # (v, 3, 3) normalized
    image: np.ndarray  # (v, h, w, 3) float32 [0, 1]
    near: np.ndarray  # (v,)
    far: np.ndarray  # (v,)
    index: np.ndarray  # (v,) frame indices
    overlap: Optional[np.ndarray] = None


@dataclass
class Example:
    context: Views
    target: Views
    scene: str
    style_image: np.ndarray  # (hs, ws, 3) float32 [0, 1]
    style_name: str = ""
