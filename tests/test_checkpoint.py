"""Checkpoint-conversion tests.

Builds a torch model skeleton whose state_dict() has EXACTLY the reference's
key names (encoder.backbone.*, encoder.downstream_head1.dpt.*, ...) at tiny
trunk dims, runs its forward, converts the state dict with
styl3r_tpu.utils.checkpoint, and checks the Flax encoder reproduces the torch
outputs — the certificate that real released checkpoints will load correctly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

from styl3r_tpu.models.encoder import Styl3rEncoder
from styl3r_tpu.utils.checkpoint import (
    convert_styl3r_encoder,
    split_noposplat_gs_head,
)
from tests.test_vit import TorchBlock, TorchDecoderBlock, torch_rope2d

torch.manual_seed(7)

# Tiny dims; DPT dims scaled down too (converter is shape-agnostic).
ENC_DIM, DEC_DIM, HEADS = 32, 16, 2
ENC_DEPTH, DEC_DEPTH = 2, 4
LAYER_DIMS = (8, 12, 16, 20)
FDIM, LAST = 24, 12
HOOKS = (0, 2, 3, 4)
B, V, H, W = 1, 2, 32, 32
SH_DEGREE = 0
D_SH = (SH_DEGREE + 1) ** 2


def grid_pos(n, gh, gw):
    ys, xs = torch.meshgrid(torch.arange(gh), torch.arange(gw), indexing="ij")
    return torch.stack([ys, xs], -1).reshape(1, -1, 2).repeat(n, 1, 1)


class TorchPatchEmbed(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, 16, 16)

    def forward(self, x):
        y = self.proj(x)
        pos = grid_pos(x.shape[0], y.shape[2], y.shape[3])
        return y.flatten(2).transpose(1, 2), pos


class TorchViTEncoder(nn.Module):
    """Reference naming: patch_embed.proj / enc_blocks.N / enc_norm."""

    def __init__(self):
        super().__init__()
        self.patch_embed = TorchPatchEmbed(ENC_DIM)
        self.enc_blocks = nn.ModuleList(
            [TorchBlock(ENC_DIM, HEADS, 100.0) for _ in range(ENC_DEPTH)]
        )
        self.enc_norm = nn.LayerNorm(ENC_DIM, eps=1e-6)

    def forward(self, images, extra_token=None):
        x, pos = self.patch_embed(images)
        if extra_token is not None:
            x = torch.cat([x, extra_token], 1)
            add = pos[:, :1].clone()
            add[:, :, 0] += pos[:, -1, 0:1] + 1
            pos = torch.cat([pos, add], 1)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos


class TorchBackbone(nn.Module):
    """Reference naming at the `backbone.` level. Note: the reference flattens
    the encoder attrs into backbone.* (patch_embed/enc_blocks/enc_norm live
    directly on the backbone), so this skeleton does too."""

    def __init__(self):
        super().__init__()
        enc = TorchViTEncoder()
        self.patch_embed = enc.patch_embed
        self.enc_blocks = enc.enc_blocks
        self.enc_norm = enc.enc_norm
        self._enc = enc
        self.intrinsic_encoder = nn.Linear(9, ENC_DIM)
        self.decoder_embed = nn.Linear(ENC_DIM, DEC_DIM)
        self.dec_blocks = nn.ModuleList(
            [TorchDecoderBlock(DEC_DIM, HEADS, 100.0) for _ in range(DEC_DEPTH)]
        )
        self.dec_blocks2 = nn.ModuleList(
            [TorchDecoderBlock(DEC_DIM, HEADS, 100.0) for _ in range(DEC_DEPTH)]
        )
        self.dec_norm = nn.LayerNorm(DEC_DIM, eps=1e-6)

    def forward(self, images, intrinsics):
        b, v = images.shape[:2]
        tok = self.intrinsic_encoder(intrinsics.flatten(0, 1).reshape(b * v, 9))[:, None]
        feat, pos = self._enc(images.flatten(0, 1), tok)
        l = feat.shape[1]
        feat = feat.reshape(b, v, l, ENC_DIM)
        pos = pos.reshape(b, v, l, 2)

        def ctx(x):
            return torch.stack(
                [torch.cat([x[:, j] for j in range(v) if j != i], 1) for i in range(v)], 1
            )

        outputs = [feat]
        x = self.decoder_embed(feat)
        pos_ctx = ctx(pos)
        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            c = ctx(x)
            f0 = blk1(x[:, 0], c[:, 0], pos[:, 0], pos_ctx[:, 0])
            frs = [blk2(x[:, i], c[:, i], pos[:, i], pos_ctx[:, i]) for i in range(1, v)]
            x = torch.stack([f0] + frs, 1)
            outputs.append(x)
        outputs[-1] = self.dec_norm(outputs[-1])
        return feat, pos, [o[:, :, :-1] for o in outputs]


class TorchTokenStylizerSkel(nn.Module):
    def __init__(self):
        super().__init__()
        enc = TorchViTEncoder()
        self.patch_embed = enc.patch_embed
        self.enc_blocks = enc.enc_blocks
        self.enc_norm = enc.enc_norm
        self._enc = enc
        self.decoder_embed = nn.Linear(ENC_DIM, DEC_DIM)
        self.dec_blocks = nn.ModuleList(
            [TorchDecoderBlock(DEC_DIM, HEADS, 100.0) for _ in range(DEC_DEPTH)]
        )
        self.dec_norm = nn.LayerNorm(DEC_DIM, eps=1e-6)

    def forward(self, style, content_feat, content_pos):
        sf, spos = self._enc(style)
        b, v, l, _ = content_feat.shape
        outputs = [content_feat]
        x = self.decoder_embed(content_feat.reshape(b, v * l, -1))
        xpos = content_pos.reshape(b, v * l, 2)
        y = self.decoder_embed(sf)
        for blk in self.dec_blocks:
            x = blk(x, y, xpos, spos)
            outputs.append(x.reshape(b, v, l, -1))
        outputs[-1] = self.dec_norm(x).reshape(b, v, l, -1)
        return [o[:, :, :-1] for o in outputs]


class TorchDPT(nn.Module):
    """Reference naming: act_postprocess.N.M / scratch.* / head.N / input_merger.0."""

    def __init__(self, dims, out_ch, head_type, merger=False):
        super().__init__()
        ld = LAYER_DIMS
        self.act_postprocess = nn.ModuleList(
            [
                nn.Sequential(nn.Conv2d(dims[0], ld[0], 1), nn.ConvTranspose2d(ld[0], ld[0], 4, 4)),
                nn.Sequential(nn.Conv2d(dims[1], ld[1], 1), nn.ConvTranspose2d(ld[1], ld[1], 2, 2)),
                nn.Sequential(nn.Conv2d(dims[2], ld[2], 1)),
                nn.Sequential(nn.Conv2d(dims[3], ld[3], 1), nn.Conv2d(ld[3], ld[3], 3, 2, 1)),
            ]
        )
        self.scratch = nn.Module()
        for i, d in enumerate(ld):
            setattr(self.scratch, f"layer{i+1}_rn", nn.Conv2d(d, FDIM, 3, 1, 1, bias=False))

        def rcu():
            m = nn.Module()
            m.conv1 = nn.Conv2d(FDIM, FDIM, 3, 1, 1)
            m.conv2 = nn.Conv2d(FDIM, FDIM, 3, 1, 1)
            return m

        for i in range(1, 5):
            fb = nn.Module()
            fb.resConfUnit1 = rcu()
            fb.resConfUnit2 = rcu()
            fb.out_conv = nn.Conv2d(FDIM, FDIM, 1)
            setattr(self.scratch, f"refinenet{i}", fb)

        self.head_type = head_type
        if head_type == "regression":
            self.head = nn.Sequential(
                nn.Conv2d(FDIM, FDIM // 2, 3, 1, 1),
                nn.Identity(),  # Interpolate (no params)
                nn.Conv2d(FDIM // 2, LAST, 3, 1, 1),
                nn.ReLU(),
                nn.Conv2d(LAST, out_ch, 1),
            )
        else:  # gs_params
            self.head = nn.Sequential(
                nn.Conv2d(FDIM, FDIM, 3, 1, 1, bias=False),
                nn.Identity(),  # BatchNorm slot (use_bn=False)
                nn.ReLU(),
                nn.Dropout(0.1),
                nn.Conv2d(FDIM, out_ch, 1),
            )
        if merger:
            self.input_merger = nn.Sequential(nn.Conv2d(3, FDIM, 7, 1, 3), nn.ReLU())

    def _rcu_fwd(self, m, x):
        return x + m.conv2(F.relu(m.conv1(F.relu(x))))

    def _fusion(self, fb, x, res=None):
        if res is not None:
            x = x + self._rcu_fwd(fb.resConfUnit1, res)
        x = self._rcu_fwd(fb.resConfUnit2, x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return fb.out_conv(x)

    def forward(self, tokens, nh, nw, imgs=None):
        layers = [tokens[h] for h in HOOKS]
        layers = [t.transpose(1, 2).reshape(t.shape[0], -1, nh, nw) for t in layers]
        layers = [self.act_postprocess[i](l) for i, l in enumerate(layers)]
        rn = [getattr(self.scratch, f"layer{i+1}_rn")(l) for i, l in enumerate(layers)]
        p4 = self._fusion(self.scratch.refinenet4, rn[3])[
            :, :, : rn[2].shape[2], : rn[2].shape[3]
        ]
        p3 = self._fusion(self.scratch.refinenet3, p4, rn[2])
        p2 = self._fusion(self.scratch.refinenet2, p3, rn[1])
        p1 = self._fusion(self.scratch.refinenet1, p2, rn[0])
        if self.head_type == "regression":
            x = self.head[0](p1)
            x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
            x = self.head[4](F.relu(self.head[2](x)))
            xyz = x.permute(0, 2, 3, 1)
            d = xyz.norm(dim=-1, keepdim=True)
            return xyz / d.clip(min=1e-8) * torch.expm1(d)
        x = F.interpolate(p1, scale_factor=2, mode="bilinear", align_corners=True)
        if hasattr(self, "input_merger"):
            x = x + self.input_merger(imgs)
        x = self.head[4](F.relu(self.head[0](x)))
        return x.permute(0, 2, 3, 1)


class HeadWrap(nn.Module):
    """Reference nests the DPT under `<name>.dpt`."""

    def __init__(self, dpt):
        super().__init__()
        self.dpt = dpt


class TorchStyl3rEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        dims = (ENC_DIM, DEC_DIM, DEC_DIM, DEC_DIM)
        self.backbone = TorchBackbone()
        self.token_stylizer = TorchTokenStylizerSkel()
        self.downstream_head1 = HeadWrap(TorchDPT(dims, 3, "regression"))
        self.downstream_head2 = HeadWrap(TorchDPT(dims, 3, "regression"))
        self.gaussian_param_head = HeadWrap(TorchDPT(dims, 8, "gs_params", merger=True))
        self.gaussian_param_head2 = HeadWrap(TorchDPT(dims, 8, "gs_params", merger=True))
        self.gaussian_appearance_head = HeadWrap(TorchDPT(dims, 3 * D_SH, "gs_params"))

    def forward(self, images, intrinsics, style):
        b, v = images.shape[:2]
        nh, nw = H // 16, W // 16
        enc_feat, enc_pos, dec_feat = self.backbone(images, intrinsics)
        sty_feat = self.token_stylizer(style, enc_feat, enc_pos)

        d0 = [t[:, 0] for t in dec_feat]
        pts = [self.downstream_head1.dpt(d0, nh, nw)]
        for i in range(1, v):
            di = [t[:, i] for t in dec_feat]
            pts.append(self.downstream_head2.dpt(di, nh, nw))
        pts = torch.stack(pts, 1)  # (b, v, h, w, 3)

        gs = [self.gaussian_param_head.dpt(d0, nh, nw, imgs=images[:, 0])]
        for i in range(1, v):
            di = [t[:, i] for t in dec_feat]
            gs.append(self.gaussian_param_head2.dpt(di, nh, nw, imgs=images[:, i]))
        gs = torch.stack(gs, 1)  # (b, v, h, w, 8)

        app = [
            self.gaussian_appearance_head.dpt([t[:, i] for t in sty_feat], nh, nw)
            for i in range(v)
        ]
        app = torch.stack(app, 1)
        raw = torch.cat([gs, app], -1)
        return pts, raw


@pytest.mark.slow
def test_converted_checkpoint_reproduces_torch_outputs():
    tm = TorchStyl3rEncoder().eval()
    # Prefix keys like the Lightning wrapper does.
    sd = {f"encoder.{k}": v for k, v in tm.state_dict().items()}

    rng = np.random.default_rng(11)
    images = rng.uniform(-1, 1, (B, V, H, W, 3)).astype(np.float32)
    intr = rng.normal(size=(B, V, 3, 3)).astype(np.float32)
    style = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        t_pts, t_raw = tm(
            torch.from_numpy(images).permute(0, 1, 4, 2, 3),
            torch.from_numpy(intr),
            torch.from_numpy(style).permute(0, 3, 1, 2),
        )

    jm = Styl3rEncoder(
        sh_degree=SH_DEGREE,
        enc_depth=ENC_DEPTH,
        dec_depth=DEC_DEPTH,
        enc_dim=ENC_DIM,
        dec_dim=DEC_DIM,
        enc_heads=HEADS,
        dec_heads=HEADS,
        head_feature_dim=FDIM,
        head_last_dim=LAST,
        head_layer_dims=LAYER_DIMS,
    )
    params = convert_styl3r_encoder(sd)
    params = jax.tree.map(jnp.asarray, params)

    g, aux = jm.apply(
        params,
        jnp.asarray(images),
        jnp.asarray(intr),
        jnp.asarray(style),
        return_aux=True,
    )
    np.testing.assert_allclose(
        aux["pts3d"], t_pts.numpy(), atol=1e-4
    )
    # Reconstruct raw-channel parity via the adapter inputs: opacity ch 0.
    dens = torch.sigmoid(t_raw[..., 0]).numpy().reshape(B, -1)
    np.testing.assert_allclose(np.asarray(g.opacities), dens, atol=1e-4)


def test_split_noposplat_gs_head():
    w = np.arange(10 * 4).reshape(10, 4).astype(np.float32)
    b = np.arange(10).astype(np.float32)
    sd = {
        "encoder.gaussian_param_head.dpt.head.4.weight": w,
        "encoder.gaussian_param_head.dpt.head.4.bias": b,
    }
    out = split_noposplat_gs_head(sd, d_sh=1)
    assert out["structure"]["dpt.head.4.weight"].shape == (7, 4)
    assert out["appearance"]["dpt.head.4.weight"].shape == (3, 4)
    np.testing.assert_array_equal(out["appearance"]["dpt.head.4.bias"], b[-3:])


class TorchNoPoSplatEncoder(nn.Module):
    """NoPoSplat release-shaped skeleton: no stylizer/appearance head; the gs
    heads carry the FULL raw channel count (structure + SH) that the style
    warm start must split (main_style.py:136-152)."""

    def __init__(self):
        super().__init__()
        dims = (ENC_DIM, DEC_DIM, DEC_DIM, DEC_DIM)
        self.backbone = TorchBackbone()
        self.downstream_head1 = HeadWrap(TorchDPT(dims, 3, "regression"))
        self.downstream_head2 = HeadWrap(TorchDPT(dims, 3, "regression"))
        self.gaussian_param_head = HeadWrap(TorchDPT(dims, 8 + 3 * D_SH, "gs_params", merger=True))
        self.gaussian_param_head2 = HeadWrap(TorchDPT(dims, 8 + 3 * D_SH, "gs_params", merger=True))


@pytest.mark.slow
def test_noposplat_warm_start_conversion_chain():
    """Full stage-2 warm-start chain: NoPoSplat ckpt -> split + convert ->
    merge over model init -> apply. Structure-head outputs must equal the
    torch gs head's structure channels; the appearance head's last conv must
    carry the SH rows; backbone/stylizer/appearance-init leaves come from the
    right sources."""
    from styl3r_tpu.utils.checkpoint import (
        convert_noposplat_encoder,
        merge_params,
        warm_start_encoder_params,
    )

    tm = TorchNoPoSplatEncoder().eval()
    sd = {f"encoder.{k}": v for k, v in tm.state_dict().items()}
    partial = warm_start_encoder_params(sd, sh_degree=SH_DEGREE)
    assert "token_stylizer" not in partial["params"]  # partial tree
    assert set(partial["params"]) == {
        "backbone", "head1", "head2",
        "gaussian_param_head", "gaussian_param_head2", "gaussian_appearance_head",
    }
    # Last-conv split: structure rows vs SH rows, torch OIHW -> flax HWIO.
    full_w = tm.gaussian_param_head.dpt.head[4].weight.detach().numpy()
    conv2 = partial["params"]["gaussian_param_head"]["head"]["head_conv2"]["kernel"]
    np.testing.assert_allclose(conv2, full_w[: -3 * D_SH].transpose(2, 3, 1, 0))
    app2 = partial["params"]["gaussian_appearance_head"]["head"]["head_conv2"]["kernel"]
    np.testing.assert_allclose(app2, full_w[-3 * D_SH :].transpose(2, 3, 1, 0))

    jm = Styl3rEncoder(
        sh_degree=SH_DEGREE, enc_depth=ENC_DEPTH, dec_depth=DEC_DEPTH,
        enc_dim=ENC_DIM, dec_dim=DEC_DIM, enc_heads=HEADS, dec_heads=HEADS,
        head_feature_dim=FDIM, head_last_dim=LAST, head_layer_dims=LAYER_DIMS,
    )
    rng = np.random.default_rng(3)
    images = rng.uniform(-1, 1, (B, V, H, W, 3)).astype(np.float32)
    intr = rng.normal(size=(B, V, 3, 3)).astype(np.float32)
    style = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    init = jm.init(jax.random.key(0), jnp.asarray(images), jnp.asarray(intr), jnp.asarray(style))
    params = jax.tree.map(jnp.asarray, merge_params(init, partial))

    g, aux = jm.apply(
        params, jnp.asarray(images), jnp.asarray(intr), jnp.asarray(style),
        return_aux=True,
    )
    assert bool(jnp.isfinite(g.means).all()) and bool(jnp.isfinite(g.harmonics).all())

    # pts3d heads loaded -> parity with the torch heads.
    with torch.no_grad():
        _, _, dec_feat = tm.backbone(
            torch.from_numpy(images).permute(0, 1, 4, 2, 3), torch.from_numpy(intr)
        )
        nh, nw = H // 16, W // 16
        t_pts0 = tm.downstream_head1.dpt([t[:, 0] for t in dec_feat], nh, nw)
        t_gs0 = tm.gaussian_param_head.dpt(
            [t[:, 0] for t in dec_feat], nh, nw,
            imgs=torch.from_numpy(images).permute(0, 1, 4, 2, 3)[:, 0],
        )
    np.testing.assert_allclose(aux["pts3d"][:, 0], t_pts0.numpy(), atol=1e-4)
    # Structure-head parity: opacity channel (raw ch 0 -> sigmoid -> density).
    dens0 = torch.sigmoid(t_gs0[..., 0]).numpy().reshape(B, -1)
    np.testing.assert_allclose(
        np.asarray(aux["densities"][:, 0]).reshape(B, -1), dens0, atol=1e-4
    )

    # convert_noposplat_encoder is the dispatch target for this flavor.
    direct = convert_noposplat_encoder(sd, SH_DEGREE)
    assert set(direct["params"]) == set(partial["params"])


def test_warm_start_dispatch_and_stylizer_conversion():
    from styl3r_tpu.utils.checkpoint import (
        convert_stylizer_weights,
        convert_token_stylizer,
        merge_params,
        warm_start_encoder_params,
    )

    # Full Styl3R ckpt -> complete tree (token_stylizer present).
    tm = TorchStyl3rEncoder()
    sd_full = {f"encoder.{k}": v for k, v in tm.state_dict().items()}
    full = warm_start_encoder_params(sd_full, SH_DEGREE)
    assert "token_stylizer" in full["params"]

    # Raw MASt3R 'model' dict (no prefix) -> backbone only.
    mast3r_sd = {
        k[len("backbone."):]: v
        for k, v in tm.backbone.state_dict(prefix="backbone.").items()
    }
    bb = warm_start_encoder_params(mast3r_sd, SH_DEGREE)
    assert set(bb["params"]) == {"backbone"}
    assert "dec_blocks2_0" in bb["params"]["backbone"]

    # Stylizer from raw MASt3R: encoder AND decoder subtrees.
    sty_skel = TorchTokenStylizerSkel()
    sty = convert_stylizer_weights(sty_skel.state_dict())
    expect = convert_token_stylizer(
        {f"token_stylizer.{k}": v for k, v in sty_skel.state_dict().items()}
    )
    got_leaves = jax.tree_util.tree_leaves(sty["params"]["token_stylizer"])
    exp_leaves = jax.tree_util.tree_leaves(expect)
    assert len(got_leaves) == len(exp_leaves)
    for a, b in zip(got_leaves, exp_leaves):
        np.testing.assert_array_equal(a, b)

    # Stylizer from a NoPoSplat Lightning ckpt: encoder subtree only.
    nps_sd = {f"encoder.backbone.{k}": v for k, v in sty_skel.state_dict().items()}
    sty_enc = convert_stylizer_weights(nps_sd)
    assert set(sty_enc["params"]["token_stylizer"]) == {"encoder"}

    # merge_params: partial leaves win, others survive.
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    out = merge_params(base, {"a": {"y": 20}})
    assert out == {"a": {"x": 1, "y": 20}, "b": 3}
