"""Torch checkpoint -> Flax params conversion.

Handles the reference's checkpoint surface (`src/main_style.py:128-192`):
  * released Styl3R/NoPoSplat `.ckpt` files: Lightning state dicts with
    `state_dict` containing `encoder.*` keys -> full Styl3rEncoder params;
  * MASt3R `.pth` files: `model` dicts for warm-starting the backbone and the
    token stylizer, including the dec_blocks -> dec_blocks2 duplication rule
    (backbone_croco_multiview.py:100-107);
  * the NoPoSplat -> style-model gaussian-head row split: the last DPT conv's
    rows [:-3*d_sh] initialize the structure head and [-3*d_sh:] the
    appearance head (main_style.py:146-152).

All layout changes (torch OIHW conv -> HWIO, linear transpose, ConvTranspose ->
PatchExpand dense) live here; module-level parity is covered by tests.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

Tensor = "np.ndarray"  # everything is converted to numpy on entry


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    return t.detach().cpu().numpy()


def _linear(sd: Mapping, prefix: str) -> Dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv(sd: Mapping, prefix: str) -> Dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _patch_expand(sd: Mapping, prefix: str, k: int) -> Dict:
    """torch ConvTranspose2d(in, out, k, stride=k) -> PatchExpand dense:
    kernel[(in), (dy*k+dx)*out + o] = W[in, o, dy, dx]."""
    w = _np(sd[f"{prefix}.weight"])  # (in, out, k, k)
    in_ch, out_ch = w.shape[0], w.shape[1]
    kernel = w.transpose(0, 2, 3, 1).reshape(in_ch, k * k * out_ch)
    bias = np.tile(_np(sd[f"{prefix}.bias"]), k * k)
    return {"expand": {"kernel": kernel, "bias": bias}}


def _attention(sd: Mapping, prefix: str) -> Dict:
    return {
        "qkv": _linear(sd, f"{prefix}.qkv"),
        "proj": _linear(sd, f"{prefix}.proj"),
    }


def _cross_attention(sd: Mapping, prefix: str) -> Dict:
    return {
        "projq": _linear(sd, f"{prefix}.projq"),
        "projk": _linear(sd, f"{prefix}.projk"),
        "projv": _linear(sd, f"{prefix}.projv"),
        "proj": _linear(sd, f"{prefix}.proj"),
    }


def _mlp(sd: Mapping, prefix: str) -> Dict:
    return {"fc1": _linear(sd, f"{prefix}.fc1"), "fc2": _linear(sd, f"{prefix}.fc2")}


def _block(sd: Mapping, prefix: str) -> Dict:
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "attn": _attention(sd, f"{prefix}.attn"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }


def _decoder_block(sd: Mapping, prefix: str) -> Dict:
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "norm3": _layernorm(sd, f"{prefix}.norm3"),
        "norm_y": _layernorm(sd, f"{prefix}.norm_y"),
        "attn": _attention(sd, f"{prefix}.attn"),
        "cross_attn": _cross_attention(sd, f"{prefix}.cross_attn"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }


def _count(sd: Mapping, pattern: str) -> int:
    n = 0
    while f"{pattern.format(n)}.norm1.weight" in sd:
        n += 1
    return n


def _vit_encoder(sd: Mapping, prefix: str) -> Dict:
    out = {
        "patch_embed": {"proj": _conv(sd, f"{prefix}.patch_embed.proj")},
        "enc_norm": _layernorm(sd, f"{prefix}.enc_norm"),
    }
    depth = _count(sd, prefix + ".enc_blocks.{}")
    for i in range(depth):
        out[f"enc_blocks_{i}"] = _block(sd, f"{prefix}.enc_blocks.{i}")
    return out


def _dpt_trunk(sd: Mapping, prefix: str) -> Dict:
    out = {
        "act_0_proj": _conv(sd, f"{prefix}.act_postprocess.0.0"),
        "act_0_up": _patch_expand(sd, f"{prefix}.act_postprocess.0.1", 4),
        "act_1_proj": _conv(sd, f"{prefix}.act_postprocess.1.0"),
        "act_1_up": _patch_expand(sd, f"{prefix}.act_postprocess.1.1", 2),
        "act_2_proj": _conv(sd, f"{prefix}.act_postprocess.2.0"),
        "act_3_proj": _conv(sd, f"{prefix}.act_postprocess.3.0"),
        "act_3_down": _conv(sd, f"{prefix}.act_postprocess.3.1"),
    }
    for i in range(1, 5):
        out[f"layer{i}_rn"] = _conv(sd, f"{prefix}.scratch.layer{i}_rn")
    for i in range(1, 5):
        rp = f"{prefix}.scratch.refinenet{i}"
        out[f"refinenet{i}"] = {
            "resConfUnit1": {
                "conv1": _conv(sd, f"{rp}.resConfUnit1.conv1"),
                "conv2": _conv(sd, f"{rp}.resConfUnit1.conv2"),
            },
            "resConfUnit2": {
                "conv1": _conv(sd, f"{rp}.resConfUnit2.conv1"),
                "conv2": _conv(sd, f"{rp}.resConfUnit2.conv2"),
            },
            "out_conv": _conv(sd, f"{rp}.out_conv"),
        }
    return out


def convert_pts3d_head(sd: Mapping, prefix: str) -> Dict:
    """'dpt' regression head (head Sequential indices 0/2/4)."""
    return {
        "trunk": _dpt_trunk(sd, f"{prefix}.dpt"),
        "head_conv1": _conv(sd, f"{prefix}.dpt.head.0"),
        "head_conv2": _conv(sd, f"{prefix}.dpt.head.2"),
        "head_conv3": _conv(sd, f"{prefix}.dpt.head.4"),
    }


def convert_gs_head(sd: Mapping, prefix: str, with_merger: bool) -> Dict:
    """'dpt_gs'/'dpt_gs_sh' heads (gs_params tower indices 0/4)."""
    out = {
        "trunk": _dpt_trunk(sd, f"{prefix}.dpt"),
        "head": {
            "head_conv1": _conv(sd, f"{prefix}.dpt.head.0"),
            "head_conv2": _conv(sd, f"{prefix}.dpt.head.4"),
        },
    }
    if with_merger:
        out["input_merger"] = _conv(sd, f"{prefix}.dpt.input_merger.0")
    return out


def convert_backbone(sd: Mapping, prefix: str = "backbone") -> Dict:
    """AsymmetricCroCoMulti weights -> MultiViewCrocoBackbone params, with the
    dec_blocks2 duplication when absent."""
    out = {
        "encoder": _vit_encoder(sd, prefix),
        "decoder_embed": _linear(sd, f"{prefix}.decoder_embed"),
        "dec_norm": _layernorm(sd, f"{prefix}.dec_norm"),
    }
    if f"{prefix}.intrinsic_encoder.weight" in sd:
        out["intrinsic_encoder"] = _linear(sd, f"{prefix}.intrinsic_encoder")
    depth = _count(sd, prefix + ".dec_blocks.{}")
    for i in range(depth):
        out[f"dec_blocks_{i}"] = _decoder_block(sd, f"{prefix}.dec_blocks.{i}")
    has_blocks2 = f"{prefix}.dec_blocks2.0.norm1.weight" in sd
    src2 = f"{prefix}.dec_blocks2" if has_blocks2 else f"{prefix}.dec_blocks"
    for i in range(depth):
        out[f"dec_blocks2_{i}"] = _decoder_block(sd, f"{src2}.{i}")
    return out


def convert_token_stylizer(sd: Mapping, prefix: str = "token_stylizer") -> Dict:
    out = {
        "encoder": _vit_encoder(sd, prefix),
        "decoder_embed": _linear(sd, f"{prefix}.decoder_embed"),
        "dec_norm": _layernorm(sd, f"{prefix}.dec_norm"),
    }
    depth = _count(sd, prefix + ".dec_blocks.{}")
    for i in range(depth):
        out[f"dec_blocks_{i}"] = _decoder_block(sd, f"{prefix}.dec_blocks.{i}")
    return out


def convert_styl3r_encoder(state_dict: Mapping, prefix: str = "encoder.") -> Dict:
    """Full released-checkpoint conversion: Lightning `state_dict` with
    `encoder.*` keys -> {'params': ...} for Styl3rEncoder."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    params = {
        "backbone": convert_backbone(sd, "backbone"),
        "token_stylizer": convert_token_stylizer(sd, "token_stylizer"),
        "head1": convert_pts3d_head(sd, "downstream_head1"),
        "head2": convert_pts3d_head(sd, "downstream_head2"),
        "gaussian_param_head": convert_gs_head(sd, "gaussian_param_head", True),
        "gaussian_param_head2": convert_gs_head(sd, "gaussian_param_head2", True),
        "gaussian_appearance_head": convert_gs_head(
            sd, "gaussian_appearance_head", False
        ),
    }
    return {"params": params}


def load_torch_state_dict(path: str) -> Dict:
    """Load a torch .ckpt/.pth on CPU and return the raw state dict
    (unwrapping Lightning's 'state_dict' / MASt3R's 'model')."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        if "state_dict" in ckpt:
            return ckpt["state_dict"]
        if "model" in ckpt:
            return ckpt["model"]
    return ckpt


def split_noposplat_gs_head(
    sd: Mapping, d_sh: int, prefix: str = "encoder.gaussian_param_head."
) -> Dict:
    """NoPoSplat -> style-model warm start: split the last gs-head conv into
    structure rows [:-3*d_sh] and appearance rows [-3*d_sh:]
    (main_style.py:146-152). Returns {'structure': {...}, 'appearance': {...}}
    partial state dicts keyed like a bare gs head."""
    head = {k[len(prefix):]: _np(v) for k, v in sd.items() if k.startswith(prefix)}
    structure = dict(head)
    appearance = dict(head)
    structure["dpt.head.4.weight"] = head["dpt.head.4.weight"][: -3 * d_sh]
    structure["dpt.head.4.bias"] = head["dpt.head.4.bias"][: -3 * d_sh]
    appearance["dpt.head.4.weight"] = head["dpt.head.4.weight"][-3 * d_sh :]
    appearance["dpt.head.4.bias"] = head["dpt.head.4.bias"][-3 * d_sh :]
    return {"structure": structure, "appearance": appearance}


def _resize_bilinear_half_pixel(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Simple bilinear resize (half-pixel centers, matching jax.image.resize)."""
    ys = (np.arange(h) + 0.5) * img.shape[0] / h - 0.5
    xs = (np.arange(w) + 0.5) * img.shape[1] / w - 0.5
    ys = np.clip(ys, 0, img.shape[0] - 1)
    xs = np.clip(xs, 0, img.shape[1] - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, img.shape[0] - 1)
    x1 = np.minimum(x0 + 1, img.shape[1] - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    return (
        img[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
        + img[np.ix_(y0, x1)] * (1 - wy) * wx
        + img[np.ix_(y1, x0)] * wy * (1 - wx)
        + img[np.ix_(y1, x1)] * wy * wx
    )


def resample_patch_embed_kernel(kernel: np.ndarray, new_size) -> np.ndarray:
    """FlexiViT pseudo-inverse patch-embedding resampling
    (reference misc/weight_modify.py:13-86): produce a (nh, nw, in, out)
    kernel such that responses on bilinearly-resized patches match the old
    kernel's responses on the originals. Needed when warm-starting at a
    different patch resolution than the checkpoint's."""
    old_h, old_w = kernel.shape[:2]
    new_h, new_w = new_size
    if (old_h, old_w) == (new_h, new_w):
        return kernel

    # Resize operator B: (new_h*new_w, old_h*old_w) acting on flattened patches.
    basis = np.eye(old_h * old_w).reshape(-1, old_h, old_w)
    b = np.stack(
        [_resize_bilinear_half_pixel(e, new_h, new_w).reshape(-1) for e in basis],
        axis=1,
    )
    # w_new = pinv(B^T) @ w_old  =>  w_new^T (B x) ~= w_old^T x for all patches x.
    projector = np.linalg.pinv(b.T)  # (new², old²)
    w_old = kernel.reshape(old_h * old_w, -1)
    w_new = projector @ w_old
    return w_new.reshape(new_h, new_w, *kernel.shape[2:]).astype(kernel.dtype)
