"""Component registries mirroring the reference's factory surface
(`src/model/encoder/__init__.py`, `backbone/__init__.py`,
`decoder/__init__.py`, `loss/__init__.py`).

Names map to the TPU-native implementations; legacy components the reference
registers but never uses in its release configs (dino/resnet backbones, the
2-view token-style encoder variant) raise with a pointer instead of silently
misbehaving.
"""

from __future__ import annotations

from typing import Any, Dict


def get_backbone(name: str, **kwargs):
    from .croco import CrocoEncBackbone, MultiViewCrocoBackbone

    if name in ("croco", "croco_multi"):
        # The multiview backbone at v=2 is exactly the asymmetric two-view
        # model (view 0 through dec_blocks, view 1 through dec_blocks2).
        return MultiViewCrocoBackbone(**kwargs)
    if name == "croco_enc":
        # Encoder-only variant used by the reference distill experiment.
        return CrocoEncBackbone(**kwargs)
    if name == "resnet":
        from .backbones import BackboneResnet

        return BackboneResnet(**kwargs)
    if name == "dino":
        from .backbones import BackboneDino

        return BackboneDino(**kwargs)
    raise ValueError(f"unknown backbone: {name}")


def get_head(name: str, out_channels: int = 3, **kwargs):
    """Head factory (reference heads/__init__.py head_factory): 'dpt' pts3d,
    'dpt_gs'/'dpt_gs_sh' gaussian-param towers, 'linear' pixel-shuffle heads."""
    from .dpt import DPTGSHead, DPTGSSHHead, DPTPts3dHead, LinearGSHead, LinearPts3dHead

    if name == "dpt":
        return DPTPts3dHead(**kwargs)
    if name == "dpt_gs":
        return DPTGSHead(out_channels=out_channels, **kwargs)
    if name == "dpt_gs_sh":
        return DPTGSSHHead(out_channels=out_channels, **kwargs)
    if name == "linear":
        return LinearPts3dHead(**kwargs)
    if name == "linear_gs":
        return LinearGSHead(out_channels=out_channels, **kwargs)
    raise ValueError(f"unknown head: {name}")


def get_encoder(name: str, **kwargs):
    from .encoder import Styl3rEncoder

    if name == "noposplat_multi_token_style":
        return Styl3rEncoder(**kwargs)
    if name == "noposplat_token_style":
        # Architecture-faithful 2-view variant: croco_enc backbone +
        # StructureBuilder + shared heads
        # (encoder_noposplat_token_style.py:150-283).
        from .encoder import Styl3rTokenStyleEncoder2View

        return Styl3rTokenStyleEncoder2View(**kwargs)
    if name in ("noposplat", "noposplat_multi"):
        # Style-free NVS encoders: architecture-faithful (no stylizer branch,
        # full-width dpt_gs heads; encoder_noposplat_multi.py:126-233).
        from .encoder import NoPoSplatMultiEncoder

        return NoPoSplatMultiEncoder(**kwargs)
    raise ValueError(f"unknown encoder: {name}")


def get_decoder(name: str = "splatting", **kwargs):
    from functools import partial

    from .decoder import render_gaussians

    if name in ("splatting", "splatting_cuda"):
        return partial(render_gaussians, **kwargs)
    raise ValueError(f"unknown decoder: {name}")


def get_distiller(name: str = "dust3r", **kwargs):
    from .distiller import Dust3RTeacher

    if name in ("dust3r", "mast3r"):
        return Dust3RTeacher(**kwargs)
    raise ValueError(f"unknown distiller: {name}")
