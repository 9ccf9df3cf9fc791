from .types import Example, Views, Stage
from .chunks import iter_chunk_examples, load_chunk, load_index, convert_poses_re10k
from .view_samplers import (
    ViewSamplerAll,
    ViewSamplerArbitrary,
    ViewSamplerBounded,
    ViewSamplerEvaluation,
    make_view_sampler,
)
from .shims import (
    apply_augmentation,
    center_crop,
    normalize_to_unit,
    prepare_style_image,
    rescale,
    rescale_and_crop,
)
from .dataset import RE10kStyleDataset, DatasetConfig, collate_examples, batch_iterator

__all__ = [
    "Example",
    "Views",
    "Stage",
    "iter_chunk_examples",
    "load_chunk",
    "load_index",
    "convert_poses_re10k",
    "ViewSamplerAll",
    "ViewSamplerArbitrary",
    "ViewSamplerBounded",
    "ViewSamplerEvaluation",
    "make_view_sampler",
    "apply_augmentation",
    "center_crop",
    "normalize_to_unit",
    "prepare_style_image",
    "rescale",
    "rescale_and_crop",
    "RE10kStyleDataset",
    "DatasetConfig",
    "collate_examples",
    "batch_iterator",
]
