"""Parity tests that EXECUTE the reference's own source files.

Unlike the hand-built torch skeletons elsewhere in tests/, these load pure
torch/einops reference modules from /root/reference by file path (bypassing
the xformers/cv2-infected package __init__) and compare the flax ports
against the reference code itself — no transcription in the fixture.

Covered here: loss_ssim.py (ssim + ms-ssim), heads/dpt_block.py +
heads/dpt_head.py (DPT trunk, regression head, exp postprocess), and
dataset/shims/crop_shim.py (rescale + center-crop + intrinsics adjustment).
"""

import importlib.util
import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF = Path("/root/reference/src")

torch.manual_seed(0)


def load_ref(relpath: str, name: str, package: dict | None = None):
    """Load a reference module by file path. `package` maps dotted module
    names to stub module objects to satisfy relative imports."""
    if package:
        for mod_name, mod in package.items():
            sys.modules.setdefault(mod_name, mod)
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _heads_pkg():
    """A real package rooted at the reference heads dir so `.dpt_block` and
    `.postprocess` relative imports resolve."""
    pkg = types.ModuleType("refheads")
    pkg.__path__ = [str(REF / "model/encoder/heads")]
    sys.modules["refheads"] = pkg
    for sub in ("dpt_block", "postprocess"):
        spec = importlib.util.spec_from_file_location(
            f"refheads.{sub}", REF / f"model/encoder/heads/{sub}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refheads.{sub}"] = mod
        spec.loader.exec_module(mod)
    spec = importlib.util.spec_from_file_location(
        "refheads.dpt_head", REF / "model/encoder/heads/dpt_head.py"
    )
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = "refheads"
    sys.modules["refheads.dpt_head"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_ssim_matches_reference_source():
    ref = load_ref("loss/loss_ssim.py", "ref_loss_ssim")
    from styl3r_tpu.losses.ssim import ssim

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (2, 48, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).permute(0, 3, 1, 2)
    ref_val = ref.ssim(ta, tb, data_range=1.0, size_average=True)[0]
    mine = float(jnp.mean(ssim(jnp.asarray(a), jnp.asarray(b))))
    np.testing.assert_allclose(mine, float(ref_val), atol=2e-5)


def test_ms_ssim_matches_reference_source():
    ref = load_ref("loss/loss_ssim.py", "ref_loss_ssim")
    # Latent bug in the reference: its ms_ssim unpacks 2 values from _ssim,
    # which returns 5 (loss_ssim.py:256 vs :58-128) — ms_ssim crashes as
    # shipped. Restore the upstream pytorch-msssim contract to execute it.
    orig_ssim = ref._ssim
    ref._ssim = lambda *a, **k: orig_ssim(*a, **k)[:2]
    from styl3r_tpu.losses.ssim import ms_ssim

    rng = np.random.default_rng(1)
    # min side must exceed (11-1)*16 = 160.
    a = rng.uniform(0, 1, (2, 176, 192, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.15, a.shape), 0, 1).astype(np.float32)
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).permute(0, 3, 1, 2)
    ref_val = float(ref.ms_ssim(ta, tb, data_range=1.0, size_average=True))
    mine = float(ms_ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(mine, ref_val, atol=2e-5)
    # Odd sizes exercise the % 2 pooling padding.
    a2, b2 = a[:, :170, :182], b[:, :170, :182]
    ref2 = float(
        ref.ms_ssim(
            torch.from_numpy(a2).permute(0, 3, 1, 2),
            torch.from_numpy(b2).permute(0, 3, 1, 2),
            data_range=1.0,
        )
    )
    mine2 = float(ms_ssim(jnp.asarray(a2), jnp.asarray(b2)))
    np.testing.assert_allclose(mine2, ref2, atol=2e-5)
    with pytest.raises(ValueError):
        ms_ssim(jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))


@pytest.mark.slow
def test_dpt_head_matches_reference_source():
    """DPTPts3dHead vs the reference's executed DPTOutputAdapter_fix +
    'exp' postprocess (heads/dpt_head.py:21-118, heads/postprocess.py)."""
    dpt_head = _heads_pkg()
    postprocess = sys.modules["refheads.postprocess"].postprocess
    from styl3r_tpu.models.dpt import DPTPts3dHead
    from styl3r_tpu.utils.checkpoint import convert_pts3d_head

    DEC_DIM, FDIM, LAST = 16, 24, 12
    LAYER_DIMS = [8, 12, 16, 20]
    HOOKS = [0, 2, 3, 4]
    H = W = 32
    nh, nw = H // 16, W // 16

    adapter = dpt_head.DPTOutputAdapter_fix(
        num_channels=3, hooks=HOOKS, layer_dims=LAYER_DIMS, feature_dim=FDIM,
        last_dim=LAST, head_type="regression",
    )
    adapter.init(dim_tokens_enc=DEC_DIM)
    adapter.eval()

    rng = np.random.default_rng(2)
    tokens = [
        rng.normal(size=(1, nh * nw, DEC_DIM)).astype(np.float32) for _ in range(5)
    ]
    with torch.no_grad():
        raw = adapter([torch.from_numpy(t) for t in tokens], image_size=(H, W))
        ref_out = postprocess(raw, ("exp", -float("inf"), float("inf")), None)
        ref_pts = ref_out["pts3d"].numpy()

    sd = {f"h.dpt.{k}": v for k, v in adapter.state_dict().items()}
    params = jax.tree.map(jnp.asarray, {"params": convert_pts3d_head(sd, "h")})
    head = DPTPts3dHead(
        feature_dim=FDIM, last_dim=LAST, hooks=tuple(HOOKS),
        layer_dims=tuple(LAYER_DIMS), patch_size=16,
    )
    mine = head.apply(params, [jnp.asarray(t) for t in tokens], (H, W))
    np.testing.assert_allclose(np.asarray(mine), ref_pts, atol=3e-5)


def test_crop_shim_matches_reference_source():
    """rescale + center_crop + intrinsics adjustment vs the executed
    reference crop shim (dataset/shims/crop_shim.py)."""
    # Stub the relative `..types` import (only names are needed).
    types_mod = types.ModuleType("refdataset.types")
    types_mod.AnyExample = dict
    types_mod.AnyViews = dict
    pkg = types.ModuleType("refdataset")
    pkg.__path__ = [str(REF / "dataset")]
    shims_pkg = types.ModuleType("refdataset.shims")
    shims_pkg.__path__ = [str(REF / "dataset/shims")]
    crop = load_ref(
        "dataset/shims/crop_shim.py",
        "refdataset.shims.crop_shim",
        package={
            "refdataset": pkg,
            "refdataset.types": types_mod,
            "refdataset.shims": shims_pkg,
        },
    )
    from styl3r_tpu.data.shims import rescale_and_crop

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (360, 640, 3)).astype(np.float32)
    intr = np.asarray(
        [[0.9, 0, 0.5], [0, 1.6, 0.5], [0, 0, 1.0]], np.float32
    )
    shape = (256, 256)

    t_img = torch.from_numpy(img).permute(2, 0, 1)
    out = crop.apply_crop_shim_to_views(
        {"image": t_img[None], "intrinsics": torch.from_numpy(intr)[None]}, shape
    )
    ref_img, ref_intr = out["image"], out["intrinsics"]
    my_img, my_intr = rescale_and_crop(img[None], intr[None], shape)
    np.testing.assert_allclose(my_intr[0], ref_intr[0].numpy(), atol=1e-6)
    # Both sides are uint8 -> PIL LANCZOS -> /255: bit-identical.
    np.testing.assert_allclose(
        my_img[0], ref_img[0].permute(1, 2, 0).numpy(), atol=1e-6
    )
    assert my_img.shape == (1, 256, 256, 3)


def test_linear_head_matches_reference_source():
    """LinearPts3dHead vs the reference's executed LinearPts3d pixel-shuffle
    head (heads/linear_head.py:12-40)."""
    _heads_pkg()
    spec = importlib.util.spec_from_file_location(
        "refheads.linear_head", REF / "model/encoder/heads/linear_head.py"
    )
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = "refheads"
    sys.modules["refheads.linear_head"] = mod
    spec.loader.exec_module(mod)

    from styl3r_tpu.models.dpt import LinearPts3dHead

    DEC_DIM, P, H, W = 16, 16, 32, 48

    class _Net:  # the reference head reads these off the croco net
        class patch_embed:
            patch_size = (P, P)

        dec_embed_dim = DEC_DIM
        depth_mode = ("exp", -float("inf"), float("inf"))
        conf_mode = None

    ref_head = mod.LinearPts3d(_Net).eval()
    rng = np.random.default_rng(4)
    tokens = rng.normal(size=(2, (H // P) * (W // P), DEC_DIM)).astype(np.float32)
    with torch.no_grad():
        ref_pts = ref_head([torch.from_numpy(tokens)], (H, W))["pts3d"].numpy()

    head = LinearPts3dHead(patch_size=P)
    params = {
        "params": {
            "proj": {
                "kernel": jnp.asarray(ref_head.proj.weight.detach().numpy().T),
                "bias": jnp.asarray(ref_head.proj.bias.detach().numpy()),
            }
        }
    }
    mine = head.apply(params, [jnp.asarray(tokens)], (H, W))
    np.testing.assert_allclose(np.asarray(mine), ref_pts, atol=2e-5)


def test_croco_enc_backbone_smoke():
    """Encoder-only backbone (backbone_croco_enc.py) via the registry."""
    from styl3r_tpu.models import get_backbone

    bb = get_backbone("croco_enc", enc_depth=2, enc_dim=32, enc_heads=2)
    imgs = jnp.zeros((1, 2, 32, 32, 3))
    intr = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
    params = bb.init(jax.random.key(0), imgs, intr)
    feat, pos = bb.apply(params, imgs, intr)
    assert feat.shape == (1, 2, 5, 32)  # 2x2 patches + intrinsics token
    assert pos.shape == (1, 2, 5, 2)


def test_ptc_geometry_matches_reference_source():
    """geotrf / normalize_pointcloud (all modes) / joint depth quantile /
    center+scale / intrinsics shims vs the executed reference
    (geometry/ptc_geometry.py)."""
    # Build the package skeleton so `..model.encoder.backbone.croco.misc`
    # resolves to the real reference misc.py (pure torch).
    names = [
        "refsrc", "refsrc.geometry", "refsrc.model", "refsrc.model.encoder",
        "refsrc.model.encoder.backbone", "refsrc.model.encoder.backbone.croco",
    ]
    for nm in names:
        mod = types.ModuleType(nm)
        mod.__path__ = []
        sys.modules.setdefault(nm, mod)
    spec = importlib.util.spec_from_file_location(
        "refsrc.model.encoder.backbone.croco.misc",
        REF / "model/encoder/backbone/croco/misc.py",
    )
    misc = importlib.util.module_from_spec(spec)
    sys.modules["refsrc.model.encoder.backbone.croco.misc"] = misc
    spec.loader.exec_module(misc)
    spec = importlib.util.spec_from_file_location(
        "refsrc.geometry.ptc_geometry", REF / "geometry/ptc_geometry.py"
    )
    ref = importlib.util.module_from_spec(spec)
    ref.__package__ = "refsrc.geometry"
    sys.modules["refsrc.geometry.ptc_geometry"] = ref
    spec.loader.exec_module(ref)

    from styl3r_tpu.geometry import ptc_geometry as mine

    rng = np.random.default_rng(7)
    b, h, w = 2, 6, 8
    pts1 = rng.normal(size=(b, h, w, 3)).astype(np.float32) * 2
    pts2 = rng.normal(size=(b, h, w, 3)).astype(np.float32) * 3
    valid1 = rng.uniform(size=(b, h, w)) > 0.3
    valid2 = rng.uniform(size=(b, h, w)) > 0.3

    # geotrf: batched SE3 on (b, h, w, 3) and projective with norm.
    trf = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    trf[:, :3, :3] = ref.inv(torch.eye(3))[None].numpy()  # identity; keep simple
    trf[:, :3, 3] = rng.normal(size=(b, 3))
    r_out = ref.geotrf(torch.from_numpy(trf), torch.from_numpy(pts1))
    m_out = mine.geotrf(jnp.asarray(trf)[:, None, None], jnp.asarray(pts1))
    np.testing.assert_allclose(np.asarray(m_out), r_out.numpy(), atol=1e-5)

    # normalize_pointcloud: every supported mode.
    for mode in ("avg_dis", "avg_log1p", "median_dis", "sqrt_dis"):
        r1, r2 = ref.normalize_pointcloud(
            torch.from_numpy(pts1), torch.from_numpy(pts2), mode,
            torch.from_numpy(valid1), torch.from_numpy(valid2),
        )
        m1, m2 = mine.normalize_pointcloud(
            jnp.asarray(pts1), jnp.asarray(pts2), mode,
            jnp.asarray(valid1), jnp.asarray(valid2),
        )
        # Invalid points get arbitrary values in the reference (NaN paths);
        # compare on the valid set only.
        np.testing.assert_allclose(
            np.asarray(m1)[valid1], r1.numpy()[valid1], rtol=2e-4, err_msg=mode
        )
        np.testing.assert_allclose(
            np.asarray(m2)[valid2], r2.numpy()[valid2], rtol=2e-4, err_msg=mode
        )

    # joint depth quantile.
    z1, z2 = pts1[..., 2], pts2[..., 2]
    r_q = ref.get_joint_pointcloud_depth(
        torch.from_numpy(z1), torch.from_numpy(z2),
        torch.from_numpy(valid1), torch.from_numpy(valid2), quantile=0.4,
    )
    m_q = mine.get_joint_pointcloud_depth(
        jnp.asarray(z1), jnp.asarray(z2), jnp.asarray(valid1),
        jnp.asarray(valid2), quantile=0.4,
    )
    # torch.nanquantile interpolates; the weighted-rank version picks the
    # crossing sample — agree to one sample spacing.
    assert np.abs(np.asarray(m_q) - r_q.numpy()).max() < 0.35

    # center + scale (median-based).
    r_c, r_s = ref.get_joint_pointcloud_center_scale(
        torch.from_numpy(pts1), torch.from_numpy(pts2),
        torch.from_numpy(valid1), torch.from_numpy(valid2),
    )
    m_c, m_s = mine.get_joint_pointcloud_center_scale(
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(valid1),
        jnp.asarray(valid2),
    )
    # medians: nanmedian picks lower-of-two; rank version likewise -> close.
    assert np.abs(np.asarray(m_c).squeeze() - r_c.numpy().squeeze()).max() < 0.35
    assert np.abs(np.asarray(m_s).squeeze() - r_s.numpy().squeeze()).max() < 0.35

    # intrinsics convention shims.
    k = np.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(
        np.asarray(mine.colmap_to_opencv_intrinsics(jnp.asarray(k))),
        ref.colmap_to_opencv_intrinsics(k.copy()),
    )
    np.testing.assert_allclose(
        np.asarray(mine.opencv_to_colmap_intrinsics(jnp.asarray(k))),
        ref.opencv_to_colmap_intrinsics(k.copy()),
    )

    # depthmap unprojection roundtrip against geotrf-based reference path.
    depth = rng.uniform(0.5, 3.0, (h, w)).astype(np.float32)
    kpix = np.asarray([[50.0, 0, 4.0], [0, 50.0, 3.0], [0, 0, 1]], np.float32)
    pose = trf[0]
    r_pts, r_valid = ref.depthmap_to_absolute_camera_coordinates(
        depth, kpix, pose
    )
    m_pts, m_valid = mine.depthmap_to_absolute_camera_coordinates(
        jnp.asarray(depth), jnp.asarray(kpix), jnp.asarray(pose)
    )
    np.testing.assert_allclose(np.asarray(m_pts), r_pts, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(m_valid), r_valid)


# ---------------------------------------------------------------------------
# Full-encoder executed-reference parity (VERDICT r2 item 4): build the
# reference's ENTIRE production encoder (multiview CroCo backbone + token
# stylizer + pts3d/dpt_gs/dpt_gs_sh heads + unified adapter) from its own
# source files at reduced dims, push its random weights through the converter,
# and assert end-to-end Gaussian parity.
# ---------------------------------------------------------------------------

def _install_third_party_stubs():
    """xformers / e3nn / torchvision stand-ins so the reference sources import.
    The xformers stub implements exact attention (what the kernel computes)."""
    if "xformers" not in sys.modules:
        xf = types.ModuleType("xformers")
        ops = types.ModuleType("xformers.ops")

        def memory_efficient_attention(q, k, v, attn_bias=None, p=0.0, scale=None):
            # xformers convention: (b, n, heads, dim).
            if scale is None:
                scale = q.shape[-1] ** -0.5
            qh = q.permute(0, 2, 1, 3)
            kh = k.permute(0, 2, 1, 3)
            vh = v.permute(0, 2, 1, 3)
            attn = (qh @ kh.transpose(-1, -2)) * scale
            if attn_bias is not None:
                attn = attn + attn_bias
            out = attn.softmax(-1) @ vh
            return out.permute(0, 2, 1, 3)

        ops.memory_efficient_attention = memory_efficient_attention
        xf.ops = ops
        sys.modules["xformers"] = xf
        sys.modules["xformers.ops"] = ops
    if "e3nn" not in sys.modules:
        e3nn = types.ModuleType("e3nn")
        o3 = types.ModuleType("e3nn.o3")
        o3.matrix_to_angles = None  # sh_rotation is bypassed by the adapter
        o3.wigner_D = None
        e3nn.o3 = o3
        sys.modules["e3nn"] = e3nn
        sys.modules["e3nn.o3"] = o3
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")

        class ResNet:  # symbol only; resnet/dino backbones are never built
            pass

        models.ResNet = ResNet
        tv.models = models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models


_REF_PKGS = [
    "refenc",
    "refenc.dataset",
    "refenc.dataset.shims",
    "refenc.geometry",
    "refenc.misc",
    "refenc.model",
    "refenc.model.encoder",
    "refenc.model.encoder.backbone",
    "refenc.model.encoder.backbone.croco",
    "refenc.model.encoder.common",
    "refenc.model.encoder.heads",
    "refenc.model.encoder.token_stylizer",
    "refenc.model.encoder.visualization",
]


def _load_reference_encoder_module():
    """Load encoder_noposplat_multi_token_style.py with its real transitive
    imports resolving against /root/reference/src (namespace-package stubs per
    level; backbone/ and heads/ execute their real __init__.py)."""
    _install_third_party_stubs()
    for name in _REF_PKGS:
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        rel = name.replace("refenc", "").replace(".", "/")
        mod.__path__ = [str(REF) + rel]
        sys.modules[name] = mod

    def exec_mod(dotted, relfile, is_pkg=False):
        full = f"refenc.{dotted}" if dotted else "refenc"
        if full in sys.modules and getattr(sys.modules[full], "__spec__", None):
            return sys.modules[full]
        kwargs = {}
        if is_pkg:
            kwargs["submodule_search_locations"] = [str((REF / relfile).parent)]
        spec = importlib.util.spec_from_file_location(full, REF / relfile, **kwargs)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = full if is_pkg else full.rsplit(".", 1)[0]
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        return mod

    # Real package __init__ for backbone/ and heads/ (they define the
    # registry symbols the encoder imports).
    exec_mod(
        "model.encoder.backbone",
        "model/encoder/backbone/__init__.py",
        is_pkg=True,
    )
    exec_mod("model.encoder.heads", "model/encoder/heads/__init__.py", is_pkg=True)
    return exec_mod(
        "model.encoder.encoder_noposplat_multi_token_style",
        "model/encoder/encoder_noposplat_multi_token_style.py",
    )


TINY_CROCO = {
    "enc_depth": 2,
    "dec_depth": 12,  # head factories assert dec_depth > 9 (real hooks 0/6/9/12)
    "enc_embed_dim": 64,
    "dec_embed_dim": 48,
    "enc_num_heads": 2,
    "dec_num_heads": 4,
    "pos_embed": "RoPE100",
    "img_size": (512, 512),
}


@pytest.mark.slow
def test_full_encoder_matches_executed_reference():
    """End-to-end: reference EncoderNoPoSplatMultiTokenStyle (executed from
    /root/reference at reduced dims) -> convert_styl3r_encoder -> flax
    Styl3rEncoder; Gaussian means/covariances/harmonics/opacities match
    (encoder_noposplat_multi_token_style.py:136-251)."""
    enc_mod = _load_reference_encoder_module()
    bb_mod = sys.modules["refenc.model.encoder.backbone.backbone_croco_multiview"]
    ts_mod = sys.modules["refenc.model.encoder.token_stylizer.token_stylizer"]
    bb_mod.croco_params["ViTLarge_BaseDecoder"] = dict(TINY_CROCO)
    ts_mod.croco_params["ViTLarge_BaseDecoder"] = dict(TINY_CROCO)

    bc = sys.modules["refenc.model.encoder.backbone.backbone_croco"]
    ga = sys.modules["refenc.model.encoder.common.gaussian_adapter"]
    tscfg = ts_mod.TokenStylizerCfg(model="ViTLarge_BaseDecoder")
    sb_mod = sys.modules["refenc.model.encoder.token_stylizer.structure_builder"]
    viz = sys.modules["refenc.model.encoder.visualization.encoder_visualizer_epipolar_cfg"]
    nts = sys.modules["refenc.model.encoder.encoder_noposplat_token_style"]

    cfg = nts.EncoderNoPoSplatTokenStyleCfg(
        name="noposplat_multi_token_style",
        d_feature=32,
        num_monocular_samples=1,
        backbone=bc.BackboneCrocoCfg(
            name="croco_multi",
            model="ViTLarge_BaseDecoder",
            intrinsics_embed_loc="encoder",
            intrinsics_embed_type="token",
        ),
        token_stylizer=tscfg,
        structure_builder=sb_mod.StructureBuilderCfg(model="ViTLarge_BaseDecoder"),
        visualizer=viz.EncoderVisualizerEpipolarCfg(
            num_samples=1, min_resolution=32, export_ply=False
        ),
        gaussian_adapter=ga.GaussianAdapterCfg(
            gaussian_scale_min=0.5, gaussian_scale_max=15.0, sh_degree=0
        ),
        apply_bounds_shim=False,
        opacity_mapping=enc_mod.OpacityMappingCfg(initial=0.0, final=0.0, warm_up=1),
        gaussians_per_pixel=1,
        num_surfaces=1,
        gs_params_head_type="dpt_gs",
        gs_sh_head_type="dpt_gs_sh",
        pose_free=True,
        stylized=True,
    )

    torch.manual_seed(5)
    ref = enc_mod.EncoderNoPoSplatMultiTokenStyle(cfg)
    # The reference hardcodes Linear(9, 1024) for the intrinsics token
    # (backbone_croco_multiview.py:78); rebuild at the tiny enc dim.
    ref.backbone.intrinsic_encoder = torch.nn.Linear(9, TINY_CROCO["enc_embed_dim"])
    ref = ref.eval()

    B, V, H, W = 1, 2, 64, 64
    rng = np.random.default_rng(6)
    images = rng.uniform(-1, 1, (B, V, 3, H, W)).astype(np.float32)
    intr = np.tile(np.eye(3, dtype=np.float32), (B, V, 1, 1))
    intr[..., 0, 0] = 0.9
    intr[..., 1, 1] = 1.2
    intr[..., :2, 2] = 0.5
    style = rng.uniform(-1, 1, (B, 3, H, W)).astype(np.float32)

    with torch.no_grad():
        ref_g = ref(
            {
                "image": torch.from_numpy(images),
                "intrinsics": torch.from_numpy(intr),
            },
            {"image": torch.from_numpy(style)},
            global_step=0,
        )

    from styl3r_tpu.models.encoder import Styl3rEncoder
    from styl3r_tpu.utils.checkpoint import convert_styl3r_encoder

    sd = {f"encoder.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_styl3r_encoder(sd))
    mine = Styl3rEncoder(
        sh_degree=0,
        enc_depth=TINY_CROCO["enc_depth"],
        dec_depth=TINY_CROCO["dec_depth"],
        enc_dim=TINY_CROCO["enc_embed_dim"],
        dec_dim=TINY_CROCO["dec_embed_dim"],
        enc_heads=TINY_CROCO["enc_num_heads"],
        dec_heads=TINY_CROCO["dec_num_heads"],
    )
    g = mine.apply(
        params,
        jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(intr),
        jnp.asarray(style.transpose(0, 2, 3, 1)),
        global_step=0,
    )

    np.testing.assert_allclose(
        np.asarray(g.means), ref_g.means.reshape(B, -1, 3).numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(g.opacities), ref_g.opacities.reshape(B, -1).numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g.covariances),
        ref_g.covariances.reshape(B, -1, 3, 3).numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g.harmonics),
        ref_g.harmonics.reshape(B, -1, 3, 1).numpy(),
        atol=1e-4,
    )


# ---------------------------------------------------------------------------
# Legacy stylizer family vs the executed reference (stylizer/stylizer.py +
# stylizer/vgg.py): NormalizedVGG slices, Linear3D (LST), AdaIN3D, AdaAttN3D.
# ---------------------------------------------------------------------------


def _load_reference_stylizer():
    # `from src.misc.nn_module_tools import convert_to_buffer` (absolute).
    for nm in ("src", "src.misc"):
        if nm not in sys.modules:
            mod = types.ModuleType(nm)
            mod.__path__ = [str(REF / nm.replace("src", "").replace(".", "/"))]
            sys.modules[nm] = mod
    spec = importlib.util.spec_from_file_location(
        "src.misc.nn_module_tools", REF / "misc/nn_module_tools.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["src.misc.nn_module_tools"] = mod
    spec.loader.exec_module(mod)

    pkg = types.ModuleType("refsty")
    pkg.__path__ = [str(REF / "model/encoder/stylizer")]
    sys.modules["refsty"] = pkg
    for sub in ("vgg", "stylizer"):
        spec = importlib.util.spec_from_file_location(
            f"refsty.{sub}", REF / f"model/encoder/stylizer/{sub}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "refsty"
        sys.modules[f"refsty.{sub}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refsty.stylizer"], sys.modules["refsty.vgg"]


def _patched_vgg_load(vgg_mod):
    """NormalizedVGG(pretrained=True) loads ckpts/vgg_normalised.pth; patch
    torch.load to hand back a seeded random state dict instead."""
    torch.manual_seed(21)
    sd = vgg_mod.make_vgg("max").state_dict()
    orig = torch.load

    def fake_load(path, *a, **k):
        if "vgg_normalised" in str(path):
            return sd
        return orig(path, *a, **k)

    return sd, fake_load


@pytest.mark.slow
def test_normalized_vgg_matches_reference_source():
    sty_mod, vgg_mod = _load_reference_stylizer()
    from styl3r_tpu.models.stylizers import NormalizedVGG, convert_normalized_vgg

    sd, fake_load = _patched_vgg_load(vgg_mod)
    torch.load, orig = fake_load, torch.load
    try:
        ref = vgg_mod.NormalizedVGG(layer=None, pool="max", pretrained=True).eval()
    finally:
        torch.load = orig

    rng = np.random.default_rng(22)
    img = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(img).permute(0, 3, 1, 2))
    params = jax.tree.map(jnp.asarray, convert_normalized_vgg(sd))
    outs = NormalizedVGG(layer=None).apply(params, jnp.asarray(img))
    assert len(outs) == 5 and len(r) == 5
    for mine_o, ref_o in zip(outs, r):
        np.testing.assert_allclose(
            np.asarray(mine_o), ref_o.permute(0, 2, 3, 1).numpy(), atol=2e-4
        )


@pytest.mark.slow
def test_legacy_stylizers_match_reference_source():
    """Linear3D (LST), AdaIN3D, AdaAttN3D vs the executed reference classes
    (stylizer.py:75-284), weights converted from their state dicts."""
    sty_mod, vgg_mod = _load_reference_stylizer()
    from styl3r_tpu.models.stylizers import (
        AdaAttN3DStylizer,
        AdaIN3DStylizer,
        Linear3DStylizer,
        _convert_conv1d_chain,
        convert_lst,
        convert_normalized_vgg,
    )

    sd_vgg, fake_load = _patched_vgg_load(vgg_mod)
    rng = np.random.default_rng(23)
    B, N, C, H, W = 2, 40, 256, 32, 32
    style = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    feats = rng.normal(size=(B, N, C)).astype(np.float32)
    t_style = torch.from_numpy(style).permute(0, 3, 1, 2)
    t_feats = torch.from_numpy(feats).transpose(2, 1)  # (b, c, n)

    torch.load, orig = fake_load, torch.load
    try:
        torch.manual_seed(31)
        ref_lin = sty_mod.Linear3DStylizer(vgg_layer=3).eval()
        torch.manual_seed(32)
        ref_adain = sty_mod.AdaIN3DStylizer(vgg_layer=3, n_zip_layers=2).eval()
        torch.manual_seed(33)
        ref_attn = sty_mod.AdaAttN3DStylizer(C, vgg_layer=3, n_zip_layers=2).eval()
    finally:
        torch.load = orig

    vgg_params = convert_normalized_vgg(sd_vgg)["params"]

    # Linear3D / LST.
    with torch.no_grad():
        r_lin = ref_lin(t_style, t_feats).transpose(2, 1).numpy()
    p = {"params": {"vgg": vgg_params, "lst": convert_lst(ref_lin.state_dict(), "lst")}}
    m_lin = Linear3DStylizer(vgg_layer=3).apply(
        jax.tree.map(jnp.asarray, p), jnp.asarray(style), jnp.asarray(feats)
    )
    np.testing.assert_allclose(np.asarray(m_lin), r_lin, atol=3e-3, rtol=1e-4)

    # AdaIN3D.
    with torch.no_grad():
        r_ad = ref_adain(t_style, t_feats).transpose(2, 1).numpy()
    sd = ref_adain.state_dict()
    p = {
        "params": {
            "vgg": vgg_params,
            "zipper": _convert_conv1d_chain(sd, "zipper", 2),
            "unzipper": _convert_conv1d_chain(sd, "unzipper", 2),
        }
    }
    m_ad = AdaIN3DStylizer(vgg_layer=3, n_zip_layers=2).apply(
        jax.tree.map(jnp.asarray, p), jnp.asarray(style), jnp.asarray(feats)
    )
    np.testing.assert_allclose(np.asarray(m_ad), r_ad, atol=2e-4)

    # AdaAttN3D.
    with torch.no_grad():
        r_at = ref_attn(t_style, t_feats).transpose(2, 1).numpy()
    sd = ref_attn.state_dict()

    def dense_from_conv1d(prefix):
        w = sd[f"{prefix}.weight"].numpy()[:, :, 0]
        return {"kernel": w.T, "bias": sd[f"{prefix}.bias"].numpy()}

    p = {
        "params": {
            "vgg": vgg_params,
            "q_zipper": _convert_conv1d_chain(sd, "q_zipper", 2),
            "v_zipper": _convert_conv1d_chain(sd, "v_zipper", 2),
            "v_unzipper": _convert_conv1d_chain(sd, "v_unzipper", 2),
            "q_embed": dense_from_conv1d("adaattn.q_embed"),
            "k_embed": dense_from_conv1d("adaattn.k_embed"),
            "s_embed": dense_from_conv1d("adaattn.s_embed"),
        }
    }
    m_at = AdaAttN3DStylizer(C, vgg_layer=3, n_zip_layers=2).apply(
        jax.tree.map(jnp.asarray, p), jnp.asarray(style), jnp.asarray(feats)
    )
    np.testing.assert_allclose(np.asarray(m_at), r_at, atol=3e-4)


def test_spin_trajectory_matches_reference_source():
    """generate_spin vs the executed reference (scipy Rotation) —
    camera_trajectory/spin.py:9-37."""
    spec = importlib.util.spec_from_file_location(
        "refspin", REF / "visualization/camera_trajectory/spin.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from styl3r_tpu.infer.trajectory import generate_spin

    ref = m.generate_spin(24, torch.device("cpu"), elevation=15.0, radius=1.5).numpy()
    mine = generate_spin(24, elevation=15.0, radius=1.5)
    np.testing.assert_allclose(mine, ref, atol=1e-6)


@pytest.mark.slow
def test_token_style_2view_encoder_matches_executed_reference():
    """The architecture-faithful 2-view token-style encoder
    (EncoderNoPoSplatTokenStyle: croco_enc backbone + StructureBuilder +
    shared heads, encoder_noposplat_token_style.py:150-283) vs the executed
    reference at reduced dims, end-to-end through the converter.

    The reference's shipped forward calls token_stylizer with a 5-arg
    signature its TokenStylizer.forward does not accept (a latent crash in
    the non-release path); the test adapts it with a stacking wrapper around
    the reference's own TokenStylizer so the executed weights/math are still
    the reference's."""
    enc_mod = _load_reference_encoder_module()
    for mod_name in (
        "refenc.model.encoder.backbone.backbone_croco_multiview",
        "refenc.model.encoder.backbone.backbone_croco_enc",
        "refenc.model.encoder.token_stylizer.token_stylizer",
        "refenc.model.encoder.token_stylizer.structure_builder",
    ):
        sys.modules[mod_name].croco_params["ViTLarge_BaseDecoder"] = dict(TINY_CROCO)

    bce = sys.modules["refenc.model.encoder.backbone.backbone_croco_enc"]
    ga = sys.modules["refenc.model.encoder.common.gaussian_adapter"]
    ts_mod = sys.modules["refenc.model.encoder.token_stylizer.token_stylizer"]
    sb_mod = sys.modules["refenc.model.encoder.token_stylizer.structure_builder"]
    viz = sys.modules["refenc.model.encoder.visualization.encoder_visualizer_epipolar_cfg"]
    nts = sys.modules["refenc.model.encoder.encoder_noposplat_token_style"]

    cfg = nts.EncoderNoPoSplatTokenStyleCfg(
        name="noposplat_token_style",
        d_feature=32,
        num_monocular_samples=1,
        backbone=bce.BackboneCrocoEncCfg(
            name="croco_enc",
            model="ViTLarge_BaseDecoder",
            intrinsics_embed_loc="encoder",
            intrinsics_embed_type="token",
        ),
        token_stylizer=ts_mod.TokenStylizerCfg(model="ViTLarge_BaseDecoder"),
        structure_builder=sb_mod.StructureBuilderCfg(model="ViTLarge_BaseDecoder"),
        visualizer=viz.EncoderVisualizerEpipolarCfg(
            num_samples=1, min_resolution=32, export_ply=False
        ),
        gaussian_adapter=ga.GaussianAdapterCfg(
            gaussian_scale_min=0.5, gaussian_scale_max=15.0, sh_degree=0
        ),
        apply_bounds_shim=False,
        opacity_mapping=nts.OpacityMappingCfg(initial=0.0, final=0.0, warm_up=1),
        gaussians_per_pixel=1,
        num_surfaces=1,
        gs_params_head_type="dpt_gs",
        gs_sh_head_type="dpt",
        pose_free=True,
        stylized=True,
    )
    torch.manual_seed(8)
    ref = nts.EncoderNoPoSplatTokenStyle(cfg)
    ref.backbone.intrinsic_encoder = torch.nn.Linear(9, TINY_CROCO["enc_embed_dim"])
    ref = ref.eval()

    # Adapt the latent 5-arg stylizer call: stack views, run the reference
    # TokenStylizer, split its per-view pyramid back out.
    real_ts = ref.token_stylizer

    class _StackedTS(torch.nn.Module):
        def forward(self, style, feat1, pos1, feat2, pos2):
            feat = torch.stack([feat1, feat2], dim=1)
            pos = torch.stack([pos1, pos2], dim=1)
            dec = real_ts(style, feat, pos)
            return [d[:, 0] for d in dec], [d[:, 1] for d in dec]

    object.__setattr__(ref, "token_stylizer", _StackedTS())
    # set_center_head attributes the head factories read live on the module:
    ref.token_stylizer.dec_embed_dim = real_ts.dec_embed_dim

    B, V, H, W = 1, 2, 64, 64
    rng = np.random.default_rng(14)
    images = rng.uniform(-1, 1, (B, V, 3, H, W)).astype(np.float32)
    intr = np.tile(np.eye(3, dtype=np.float32), (B, V, 1, 1))
    intr[..., 0, 0] = 1.1
    intr[..., 1, 1] = 0.8
    intr[..., :2, 2] = 0.5
    style = rng.uniform(-1, 1, (B, 3, H, W)).astype(np.float32)

    with torch.no_grad():
        ref_g = ref(
            {"image": torch.from_numpy(images), "intrinsics": torch.from_numpy(intr)},
            {"image": torch.from_numpy(style)},
            global_step=0,
        )

    from styl3r_tpu.models.encoder import Styl3rTokenStyleEncoder2View
    from styl3r_tpu.utils.checkpoint import convert_token_style_encoder

    sd = {f"encoder.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_token_style_encoder(sd))
    mine = Styl3rTokenStyleEncoder2View(
        sh_degree=0,
        enc_depth=TINY_CROCO["enc_depth"],
        dec_depth=TINY_CROCO["dec_depth"],
        enc_dim=TINY_CROCO["enc_embed_dim"],
        dec_dim=TINY_CROCO["dec_embed_dim"],
        enc_heads=TINY_CROCO["enc_num_heads"],
        dec_heads=TINY_CROCO["dec_num_heads"],
    )
    g = mine.apply(
        params,
        jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(intr),
        jnp.asarray(style.transpose(0, 2, 3, 1)),
        global_step=0,
    )
    np.testing.assert_allclose(
        np.asarray(g.means), ref_g.means.reshape(B, -1, 3).numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(g.opacities), ref_g.opacities.reshape(B, -1).numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g.covariances),
        ref_g.covariances.reshape(B, -1, 3, 3).numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g.harmonics),
        ref_g.harmonics.reshape(B, -1, 3, 1).numpy(),
        atol=1e-4,
    )


@pytest.mark.slow
def test_noposplat_multi_encoder_matches_executed_reference():
    """The style-free NoPoSplat N-view encoder (EncoderNoPoSplatMulti,
    encoder_noposplat_multi.py:126-233) vs the executed reference at reduced
    dims, end-to-end through convert_noposplat_multi_encoder."""
    _load_reference_encoder_module()
    bb_mod = sys.modules["refenc.model.encoder.backbone.backbone_croco_multiview"]
    bb_mod.croco_params["ViTLarge_BaseDecoder"] = dict(TINY_CROCO)

    def exec_mod(dotted, relfile):
        full = f"refenc.{dotted}"
        if full in sys.modules and getattr(sys.modules[full], "__spec__", None):
            return sys.modules[full]
        spec = importlib.util.spec_from_file_location(full, REF / relfile)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = full.rsplit(".", 1)[0]
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        return mod

    npm = exec_mod(
        "model.encoder.encoder_noposplat_multi",
        "model/encoder/encoder_noposplat_multi.py",
    )
    bc = sys.modules["refenc.model.encoder.backbone.backbone_croco"]
    ga = sys.modules["refenc.model.encoder.common.gaussian_adapter"]
    viz = sys.modules["refenc.model.encoder.visualization.encoder_visualizer_epipolar_cfg"]
    np_mod = sys.modules["refenc.model.encoder.encoder_noposplat"]

    cfg = np_mod.EncoderNoPoSplatCfg(
        name="noposplat_multi",
        d_feature=32,
        num_monocular_samples=1,
        backbone=bc.BackboneCrocoCfg(
            name="croco_multi",
            model="ViTLarge_BaseDecoder",
            intrinsics_embed_loc="encoder",
            intrinsics_embed_type="token",
        ),
        visualizer=viz.EncoderVisualizerEpipolarCfg(
            num_samples=1, min_resolution=32, export_ply=False
        ),
        gaussian_adapter=ga.GaussianAdapterCfg(
            gaussian_scale_min=0.5, gaussian_scale_max=15.0, sh_degree=0
        ),
        apply_bounds_shim=False,
        opacity_mapping=npm.OpacityMappingCfg(initial=0.0, final=0.0, warm_up=1),
        gaussians_per_pixel=1,
        num_surfaces=1,
        gs_params_head_type="dpt_gs",
        pose_free=True,
    )
    torch.manual_seed(19)
    ref = npm.EncoderNoPoSplatMulti(cfg)
    ref.backbone.intrinsic_encoder = torch.nn.Linear(9, TINY_CROCO["enc_embed_dim"])
    ref = ref.eval()

    # Latent reference bug: this forward unpacks `dec_feat, shape, images`
    # from the backbone, but AsymmetricCroCoMulti.forward returns 5 values
    # (it was evolved for the token-style encoder; encoder_noposplat_multi.py
    # was not updated). Adapt with a 3-tuple wrapper around the real backbone.
    real_bb = ref.backbone

    class _BB3(torch.nn.Module):
        def forward(self, context):
            _, _, dec_feat, shape, images = real_bb(context)
            return dec_feat, shape, images

    object.__setattr__(ref, "backbone", _BB3())

    B, V, H, W = 1, 3, 64, 64
    rng = np.random.default_rng(20)
    images = rng.uniform(-1, 1, (B, V, 3, H, W)).astype(np.float32)
    intr = np.tile(np.eye(3, dtype=np.float32), (B, V, 1, 1))
    intr[..., 0, 0] = 0.95
    intr[..., 1, 1] = 1.05
    intr[..., :2, 2] = 0.5

    with torch.no_grad():
        ref_g = ref(
            {"image": torch.from_numpy(images), "intrinsics": torch.from_numpy(intr)},
            global_step=0,
        )

    from styl3r_tpu.models.encoder import NoPoSplatMultiEncoder
    from styl3r_tpu.utils.checkpoint import convert_noposplat_multi_encoder

    sd = {f"encoder.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_noposplat_multi_encoder(sd))
    mine = NoPoSplatMultiEncoder(
        sh_degree=0,
        enc_depth=TINY_CROCO["enc_depth"],
        dec_depth=TINY_CROCO["dec_depth"],
        enc_dim=TINY_CROCO["enc_embed_dim"],
        dec_dim=TINY_CROCO["dec_embed_dim"],
        enc_heads=TINY_CROCO["enc_num_heads"],
        dec_heads=TINY_CROCO["dec_num_heads"],
    )
    g = mine.apply(
        params,
        jnp.asarray(images.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(intr),
        global_step=0,
    )
    np.testing.assert_allclose(
        np.asarray(g.means), ref_g.means.reshape(B, -1, 3).numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(g.opacities), ref_g.opacities.reshape(B, -1).numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g.covariances),
        ref_g.covariances.reshape(B, -1, 3, 3).numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g.harmonics),
        ref_g.harmonics.reshape(B, -1, 3, 1).numpy(),
        atol=1e-4,
    )


def test_render_orthographic_matches_reference_source():
    """Executes the reference's render_cuda_orthographic camera/projection
    construction (cuda_splatting.py:136-227 — pure torch up to the CUDA
    rasterizer call, stubbed here to capture its settings) and goldens our
    orthographic_cameras + make_raster_camera against it: move-back
    extrinsics, tan-fov pair, shifted near/far, and the final pixel-space
    projection of random 3D points (reference full_projection + ndc2Pix vs
    our pinhole RasterCamera path)."""
    captured = []

    class Settings:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    class Rasterizer:
        def __init__(self, raster_settings):
            self.s = raster_settings

        def __call__(self, **kw):
            captured.append((self.s, kw))
            g = kw["means3D"].shape[0]
            h, w = self.s.image_height, self.s.image_width
            z = torch.zeros
            return z(3, h, w), z(g), z(1, h, w), z(1, h, w), z(g)

    dgr = types.ModuleType("diff_gaussian_rasterization")
    dgr.GaussianRasterizationSettings = Settings
    dgr.GaussianRasterizer = Rasterizer

    # Package scaffolding so cuda_splatting's `...geometry.projection`
    # relative import resolves to the real reference source.
    pkgs = {}
    for name, path in (
        ("refsrc", REF),
        ("refsrc.model", REF / "model"),
        ("refsrc.model.decoder", REF / "model/decoder"),
        ("refsrc.geometry", REF / "geometry"),
    ):
        pkg = types.ModuleType(name)
        pkg.__path__ = [str(path)]
        pkgs[name] = pkg
    pkgs["diff_gaussian_rasterization"] = dgr
    load_ref("geometry/projection.py", "refsrc.geometry.projection", pkgs)
    spec = importlib.util.spec_from_file_location(
        "refsrc.model.decoder.cuda_splatting",
        REF / "model/decoder/cuda_splatting.py",
    )
    ref = importlib.util.module_from_spec(spec)
    ref.__package__ = "refsrc.model.decoder"
    sys.modules["refsrc.model.decoder.cuda_splatting"] = ref
    spec.loader.exec_module(ref)

    from styl3r_tpu.models.decoder import orthographic_cameras
    from styl3r_tpu.ops.rasterizer.camera import make_raster_camera

    rng = np.random.default_rng(17)
    g = 8
    h, w = 32, 48
    # The reference function itself only supports b=1 (its scalar
    # move_back[2, 3] = -distance_to_near assignment breaks for batched
    # widths; render_projections always reaches it with per-axis calls whose
    # width tensors broadcast only at b=1) — golden three independent rigs.
    for case in range(3):
        captured.clear()
        a = torch.from_numpy(rng.normal(0, 0.5, (3,)).astype(np.float32))
        skew = torch.zeros(3, 3)
        skew[0, 1], skew[0, 2], skew[1, 2] = -a[2], a[1], -a[0]
        skew = skew - skew.T
        e = torch.eye(4)
        e[:3, :3] = torch.matrix_exp(skew)
        e[:3, 3] = torch.from_numpy(rng.normal(0, 1.0, (3,)).astype(np.float32))
        extrinsics = e[None]
        width = torch.from_numpy(rng.uniform(2.0, 5.0, (1,)).astype(np.float32))
        height = torch.from_numpy(rng.uniform(2.0, 5.0, (1,)).astype(np.float32))
        near = torch.full((1,), 0.1)
        far = torch.full((1,), 100.0)
        means = torch.from_numpy(rng.normal(0, 1.0, (1, g, 3)).astype(np.float32))
        covs = torch.eye(3).expand(1, g, 3, 3) * 0.01
        shs = torch.from_numpy(rng.uniform(0, 1, (1, g, 3, 1)).astype(np.float32))
        opa = torch.full((1, g), 0.9)
        bg = torch.zeros(1, 3)

        dump = {}
        ref.render_cuda_orthographic(
            extrinsics, width, height, near, far, (h, w), bg, means, covs,
            shs, opa, fov_degrees=10.0, use_sh=False, dump=dump,
        )
        assert len(captured) == 1
        s = captured[0][0]

        my_ext, my_k, my_near, my_far = orthographic_cameras(
            jnp.asarray(extrinsics.numpy())[None],
            jnp.asarray(width.numpy())[None],
            jnp.asarray(height.numpy())[None],
            jnp.asarray(near.numpy())[None],
            jnp.asarray(far.numpy())[None],
            fov_degrees=10.0,
        )

        # 1. Camera move-back + near/far shift match the executed reference.
        np.testing.assert_allclose(
            np.asarray(my_ext[0]), dump["extrinsics"].numpy(), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(my_near[0]), dump["near"].numpy(), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(my_far[0]), dump["far"].numpy(), rtol=1e-5
        )

        cam = make_raster_camera(my_ext[0], my_k[0], my_near[0], my_far[0], (h, w))
        # 2. tan-fov pair.
        np.testing.assert_allclose(
            float(cam.tan_fov[0, 0]), float(s.tanfovx), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(cam.tan_fov[0, 1]), float(s.tanfovy), rtol=1e-4
        )
        # 3. View matrix and camera position.
        np.testing.assert_allclose(
            np.asarray(cam.w2c[0]), s.viewmatrix.numpy().T, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(cam.cam_pos[0]), s.campos.numpy(), rtol=1e-4, atol=1e-5
        )
        # 4. Pixel-space projection: reference full_projection (row-vector
        # convention) + the CUDA ndc2Pix((x+1)*S-1)/2 vs our pinhole path
        # (project.py mean_x = fx tx/tz + cx - 0.5).
        homog = torch.cat([means[0], torch.ones(g, 1)], -1)
        p_hom = homog @ s.projmatrix  # projmatrix is stored transposed
        p_ndc = (p_hom[:, :3] / (p_hom[:, 3:4] + 1e-7)).numpy()
        ref_px = ((p_ndc[:, 0] + 1) * w - 1) * 0.5
        ref_py = ((p_ndc[:, 1] + 1) * h - 1) * 0.5
        pv = homog @ s.viewmatrix
        tx, ty, tz = pv[:, 0].numpy(), pv[:, 1].numpy(), pv[:, 2].numpy()
        my_px = (
            np.asarray(cam.focal[0, 0]) * tx / tz
            + np.asarray(cam.principal[0, 0]) - 0.5
        )
        my_py = (
            np.asarray(cam.focal[0, 1]) * ty / tz
            + np.asarray(cam.principal[0, 1]) - 0.5
        )
        np.testing.assert_allclose(my_px, ref_px, rtol=1e-3, atol=5e-3)
        # Documented reference quirk (cuda_splatting.py:166): it derives
        # fov_y = atan(2 * tan_fov_y) — not 2 * atan(tan_fov_y) — so the
        # y-scale baked into ITS projmatrix is tan(0.5 * atan(2t)) instead of
        # the t it hands the rasterizer settings as tanfovy (check #2 above
        # proves we match the settings value exactly). Apply that factor to
        # compare against the quirked projmatrix; our consistent pinhole K
        # is the correct construction.
        t = float(s.tanfovy)
        t_quirk = np.tan(0.5 * np.arctan(2.0 * t))
        quirk_py = (
            np.asarray(cam.focal[0, 1]) * (t / t_quirk) * ty / tz
            + np.asarray(cam.principal[0, 1]) - 0.5
        )
        np.testing.assert_allclose(quirk_py, ref_py, rtol=1e-3, atol=5e-3)
        # And without the quirk we are within the ~1% the quirk introduces.
        np.testing.assert_allclose(my_py, ref_py, rtol=1.5e-2, atol=5e-3)
