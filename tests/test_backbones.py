"""Legacy dino/resnet backbone tests (backbone_resnet.py / backbone_dino.py).

torchvision is not installed in this environment, so the parity fixtures are
executable torch replicas with torchvision's exact module layout and state-
dict names (BasicBlock conv1/bn1/conv2/bn2/downsample.{0,1}, stem conv1/bn1,
InstanceNorm2d norm layer per the reference's constructor) — the converter
consumes the same keys a real torchvision checkpoint carries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F


def make_instance_norm(ch):
    return nn.InstanceNorm2d(ch, affine=False, track_running_stats=False)


class TorchBasicBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = make_instance_norm(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = make_instance_norm(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                make_instance_norm(out_ch),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + identity)


class TorchResnet18(nn.Module):
    """torchvision resnet18 layout with InstanceNorm (reference constructor,
    backbone_resnet.py:36-45)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = make_instance_norm(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        in_ch = 64
        for li, w in enumerate(widths, start=1):
            blocks = []
            for bi in range(2):
                stride = 2 if (li > 1 and bi == 0) else 1
                blocks.append(TorchBasicBlock(in_ch, w, stride))
                in_ch = w
            setattr(self, f"layer{li}", nn.Sequential(*blocks))


class TorchBackboneResnet(nn.Module):
    """The reference BackboneResnet forward (backbone_resnet.py:66-101)."""

    def __init__(self, num_layers=4, d_out=16):
        super().__init__()
        self.model = TorchResnet18()
        self.projections = nn.ModuleDict(
            {
                "layer0": nn.Conv2d(64, d_out, 1),
                **{
                    f"layer{i}": nn.Conv2d([64, 128, 256][i - 1], d_out, 1)
                    for i in range(1, num_layers)
                },
            }
        )
        self.num_layers = num_layers
        self.use_first_pool = True

    def forward(self, x):
        h, w = x.shape[-2:]
        x = self.model.relu(self.model.bn1(self.model.conv1(x)))
        feats = [self.projections["layer0"](x)]
        x = self.model.maxpool(x)
        for i in range(1, self.num_layers):
            x = getattr(self.model, f"layer{i}")(x)
            feats.append(self.projections[f"layer{i}"](x))
        feats = [
            F.interpolate(f, (h, w), mode="bilinear", align_corners=True)
            for f in feats
        ]
        return torch.stack(feats).sum(0)


def test_bilinear_align_corners_matches_torch():
    from styl3r_tpu.models.backbones import resize_bilinear_align_corners

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    t = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), (16, 12),
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    mine = resize_bilinear_align_corners(jnp.asarray(x), (16, 12))
    np.testing.assert_allclose(np.asarray(mine), t, atol=1e-5)


@pytest.mark.slow
def test_resnet_backbone_matches_torch_layout():
    """BackboneResnet vs the torch replica with torchvision state-dict keys,
    through convert_backbone_resnet."""
    from styl3r_tpu.models.backbones import BackboneResnet, convert_backbone_resnet

    torch.manual_seed(11)
    ref = TorchBackboneResnet(num_layers=4, d_out=16).eval()
    rng = np.random.default_rng(5)
    imgs = rng.uniform(-1, 1, (1, 2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(imgs.reshape(2, 32, 32, 3)).permute(0, 3, 1, 2))
    r = r.permute(0, 2, 3, 1).numpy().reshape(1, 2, 32, 32, 16)

    params = jax.tree.map(
        jnp.asarray,
        convert_backbone_resnet(ref.state_dict(), "resnet18", num_layers=4),
    )
    mine = BackboneResnet(model="resnet18", num_layers=4, d_out=16).apply(
        params, jnp.asarray(imgs)
    )
    np.testing.assert_allclose(np.asarray(mine), r, atol=5e-4, rtol=1e-3)


class TorchDinoBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, self.heads, d // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = F.scaled_dot_product_attention(q, k, v)
        att = att.transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(att)
        y = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(y)))


@pytest.mark.slow
def test_dino_vit_matches_torch_layout():
    """DinoViT vs a dino-layout torch replica (cls token, learned pos embed,
    pre-norm qkv blocks, final norm) through convert_dino_vit."""
    from styl3r_tpu.models.backbones import DinoViT, convert_dino_vit

    dim, heads, depth, ps = 32, 4, 3, 8

    class TorchDino(nn.Module):
        def __init__(self):
            super().__init__()
            self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
            self.pos_embed = nn.Parameter(torch.randn(1, 1 + 16, dim) * 0.02)
            self.patch_embed = nn.Module()
            self.patch_embed.proj = nn.Conv2d(3, dim, ps, ps)
            self.blocks = nn.ModuleList(
                [TorchDinoBlock(dim, heads) for _ in range(depth)]
            )
            self.norm = nn.LayerNorm(dim, eps=1e-6)

        def forward(self, x):
            b = x.shape[0]
            x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
            x = x + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            return self.norm(x)

    torch.manual_seed(13)
    ref = TorchDino().eval()
    rng = np.random.default_rng(7)
    imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()

    params = {"params": jax.tree.map(jnp.asarray, convert_dino_vit(ref.state_dict()))}
    mine = DinoViT(patch_size=ps, dim=dim, depth=depth, num_heads=heads).apply(
        params, jnp.asarray(imgs)
    )
    np.testing.assert_allclose(np.asarray(mine), r, atol=2e-5)


def test_dino_backbone_shapes():
    from styl3r_tpu.models import get_backbone

    bb = get_backbone("dino", model="dino_vits8", d_out=8)
    imgs = jnp.zeros((1, 2, 16, 16, 3))
    params = bb.init(jax.random.key(0), imgs)
    out = bb.apply(params, imgs)
    assert out.shape == (1, 2, 16, 16, 8)

    bb2 = get_backbone("resnet", model="resnet18", num_layers=2, d_out=4)
    params2 = bb2.init(jax.random.key(1), imgs)
    out2 = bb2.apply(params2, imgs)
    assert out2.shape == (1, 2, 16, 16, 4)
