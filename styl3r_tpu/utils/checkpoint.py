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


def convert_structure_builder(sd: Mapping, prefix: str = "structure_builder") -> Dict:
    out = {
        "decoder_embed": _linear(sd, f"{prefix}.decoder_embed"),
        "dec_norm": _layernorm(sd, f"{prefix}.dec_norm"),
    }
    depth = _count(sd, prefix + ".dec_blocks.{}")
    for i in range(depth):
        out[f"dec_blocks_{i}"] = _block(sd, f"{prefix}.dec_blocks.{i}")
    return out


def convert_croco_enc_backbone(sd: Mapping, prefix: str = "backbone") -> Dict:
    """AsymmetricCroCoEnc (encoder-only) -> CrocoEncBackbone params."""
    out = {"encoder": _vit_encoder(sd, prefix)}
    if f"{prefix}.intrinsic_encoder.weight" in sd:
        out["intrinsic_encoder"] = _linear(sd, f"{prefix}.intrinsic_encoder")
    return out


def convert_token_style_encoder(state_dict: Mapping, prefix: str = "encoder.") -> Dict:
    """2-view EncoderNoPoSplatTokenStyle checkpoint
    (encoder_noposplat_token_style.py:150-283) -> Styl3rTokenStyleEncoder2View
    params."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    params = {
        "backbone": convert_croco_enc_backbone(sd, "backbone"),
        "structure_builder": convert_structure_builder(sd, "structure_builder"),
        "token_stylizer": convert_token_stylizer(sd, "token_stylizer"),
        "head1": convert_pts3d_head(sd, "downstream_head1"),
        "gaussian_structure_head": convert_gs_head(
            sd, "gaussian_structure_head", False
        ),
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


def merge_params(base, partial):
    """Deep-merge a partial converted pytree over a model-initialized one:
    the functional equivalent of torch `load_state_dict(strict=False)` used
    throughout the reference warm-starts (main_style.py:128-168). Leaves
    present in `partial` win; everything else keeps its init value."""
    if isinstance(base, Mapping) and isinstance(partial, Mapping):
        out = dict(base)
        for k, v in partial.items():
            out[k] = merge_params(base[k], v) if k in base else v
        return out
    return partial


def convert_noposplat_multi_encoder(state_dict: Mapping, prefix: str = "encoder.") -> Dict:
    """NoPoSplat checkpoint -> NoPoSplatMultiEncoder params (the style-free
    architecture itself, full-width dpt_gs heads — no row splitting;
    encoder_noposplat_multi.py:126-233)."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    return {
        "params": {
            "backbone": convert_backbone(sd, "backbone"),
            "head1": convert_pts3d_head(sd, "downstream_head1"),
            "head2": convert_pts3d_head(sd, "downstream_head2"),
            "gaussian_param_head": convert_gs_head(sd, "gaussian_param_head", True),
            "gaussian_param_head2": convert_gs_head(sd, "gaussian_param_head2", True),
        }
    }


def convert_noposplat_encoder(state_dict: Mapping, sh_degree: int = 0) -> Dict:
    """NoPoSplat release `.ckpt` -> partial Styl3rEncoder params for the
    stage-2 style warm start (main_style.py:136-152): backbone + pts3d heads
    load directly; each gaussian_param_head keeps only its structure rows
    (last conv rows [:-3*d_sh]); the appearance head is seeded from the view-0
    gs head with only the SH rows ([-3*d_sh:]) of the last conv swapped in
    (the trunk copies over wholesale, like the reference's strict=False
    load onto gaussian_appearance_head)."""
    sd = {k[len("encoder."):]: v for k, v in state_dict.items() if k.startswith("encoder.")}
    dsh = (sh_degree + 1) ** 2
    params = {
        "backbone": convert_backbone(sd, "backbone"),
        "head1": convert_pts3d_head(sd, "downstream_head1"),
        "head2": convert_pts3d_head(sd, "downstream_head2"),
    }
    for name in ("gaussian_param_head", "gaussian_param_head2"):
        split = split_noposplat_gs_head(state_dict, dsh, prefix=f"encoder.{name}.")
        params[name] = convert_gs_head(
            {f"h.{k}": v for k, v in split["structure"].items()}, "h", True
        )
    split0 = split_noposplat_gs_head(
        state_dict, dsh, prefix="encoder.gaussian_param_head."
    )
    params["gaussian_appearance_head"] = convert_gs_head(
        {f"h.{k}": v for k, v in split0["appearance"].items()}, "h", False
    )
    return {"params": params}


def convert_mast3r_backbone(state_dict: Mapping, patch_size: Optional[int] = None) -> Dict:
    """Raw MASt3R/DUSt3R `model` dict -> partial params covering only the
    CroCo backbone trunk (reference checkpoint_filter_fn + strict=False load,
    main_style.py:130-135 / weight_modify.py:144-184). Heads keep their init.
    With `patch_size` given, the patch-embed kernel is FlexiViT-resampled when
    the checkpoint's patch size differs."""
    wrapped = {f"backbone.{k}": v for k, v in state_dict.items()}
    params = convert_backbone(wrapped, "backbone")
    if patch_size is not None:
        kernel = params["encoder"]["patch_embed"]["proj"]["kernel"]
        if kernel.shape[0] != patch_size:
            params["encoder"]["patch_embed"]["proj"]["kernel"] = (
                resample_patch_embed_kernel(kernel, (patch_size, patch_size))
            )
    return {"params": {"backbone": params}}


def convert_stylizer_weights(state_dict: Mapping) -> Dict:
    """Token-stylizer warm start (main_style.py:156-168): a raw MASt3R
    `model` dict seeds the stylizer's encoder AND decoder; a NoPoSplat
    Lightning ckpt seeds only the stylizer encoder from `encoder.backbone.*`
    (the reference filters to enc/mask_token/patch_embed keys there)."""
    if any(k.startswith("encoder.backbone.") for k in state_dict):
        sd = {
            f"s.{k[len('encoder.backbone.'):]}": v
            for k, v in state_dict.items()
            if k.startswith("encoder.backbone.")
        }
        return {"params": {"token_stylizer": {"encoder": _vit_encoder(sd, "s")}}}
    wrapped = {f"s.{k}": v for k, v in state_dict.items()}
    return {"params": {"token_stylizer": convert_token_stylizer(wrapped, "s")}}


def warm_start_encoder_params(state_dict: Mapping, sh_degree: int = 0) -> Dict:
    """Dispatch on checkpoint flavor like the reference warm-start block
    (main_style.py:128-155): full Styl3R ckpt -> complete params; NoPoSplat
    ckpt -> backbone+heads with the gs-head row split; raw MASt3R `model`
    dict -> backbone only. Returns a (possibly partial) {'params': ...} tree
    for merge_params over model.init output."""
    if any(k.startswith("encoder.token_stylizer.") for k in state_dict):
        return convert_styl3r_encoder(state_dict)
    if any(k.startswith("encoder.") for k in state_dict):
        return convert_noposplat_encoder(state_dict, sh_degree)
    return convert_mast3r_backbone(state_dict)


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
