"""Parity tests for the DPT heads vs a torch reference of the same published
architecture (DPT trunk + DUSt3R gs/pts3d towers)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from styl3r_tpu.models.dpt import (
    DPTGSHead,
    DPTGSSHHead,
    DPTPts3dHead,
    PatchExpand,
    reg_dense_pts3d,
    resize_bilinear_ac,
)

torch.manual_seed(3)

ENC_DIM, DEC_DIM = 40, 24
HOOKS = (0, 1, 2, 3)
FDIM = 32  # trunk feature dim (256 in production)
H = W = 32  # 2x2 tokens at patch 16


def test_resize_bilinear_align_corners_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    for out_h, out_w in [(10, 14), (9, 13), (5, 7)]:
        ours = resize_bilinear_ac(jnp.asarray(x), out_h, out_w)
        theirs = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=(out_h, out_w),
            mode="bilinear",
            align_corners=True,
        ).permute(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-5)


def test_patch_expand_matches_torch_convtranspose():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 4, 6)).astype(np.float32)
    for k in (2, 4):
        tconv = torch.nn.ConvTranspose2d(6, 5, kernel_size=k, stride=k)
        with torch.no_grad():
            expected = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        w = tconv.weight.detach().numpy()  # (in, out, k, k)
        kernel = w.transpose(0, 2, 3, 1).reshape(6, k * k * 5)
        bias = np.tile(tconv.bias.detach().numpy(), k * k)
        pe = PatchExpand(features=5, factor=k)
        out = pe.apply(
            {"params": {"expand": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(out, expected.numpy(), atol=1e-5)


def test_reg_dense_pts3d():
    raw = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    out = reg_dense_pts3d(raw)
    np.testing.assert_allclose(out, [[0.0, 0.0, np.expm1(2.0)]], rtol=1e-6)


# ---------------------------------------------------------------------------
# Full-head parity
# ---------------------------------------------------------------------------


class TorchRCU(torch.nn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(f, f, 3, 1, 1)
        self.conv2 = torch.nn.Conv2d(f, f, 3, 1, 1)

    def forward(self, x):
        out = self.conv2(F.relu(self.conv1(F.relu(x))))
        return out + x


class TorchFusion(torch.nn.Module):
    def __init__(self, f):
        super().__init__()
        self.resConfUnit1 = TorchRCU(f)
        self.resConfUnit2 = TorchRCU(f)
        self.out_conv = torch.nn.Conv2d(f, f, 1)

    def forward(self, x, res=None):
        if res is not None:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class TorchDPTTrunk(torch.nn.Module):
    def __init__(self, dims, layer_dims=(8, 12, 16, 20), f=FDIM):
        super().__init__()
        ld = layer_dims
        self.p0 = torch.nn.Conv2d(dims[0], ld[0], 1)
        self.u0 = torch.nn.ConvTranspose2d(ld[0], ld[0], 4, 4)
        self.p1 = torch.nn.Conv2d(dims[1], ld[1], 1)
        self.u1 = torch.nn.ConvTranspose2d(ld[1], ld[1], 2, 2)
        self.p2 = torch.nn.Conv2d(dims[2], ld[2], 1)
        self.p3 = torch.nn.Conv2d(dims[3], ld[3], 1)
        self.d3 = torch.nn.Conv2d(ld[3], ld[3], 3, 2, 1)
        self.rn = torch.nn.ModuleList(
            [torch.nn.Conv2d(d, f, 3, 1, 1, bias=False) for d in ld]
        )
        self.refine4 = TorchFusion(f)
        self.refine3 = TorchFusion(f)
        self.refine2 = TorchFusion(f)
        self.refine1 = TorchFusion(f)

    def forward(self, tokens, nh, nw):
        layers = [t.transpose(1, 2).reshape(t.shape[0], -1, nh, nw) for t in tokens]
        l0 = self.u0(self.p0(layers[0]))
        l1 = self.u1(self.p1(layers[1]))
        l2 = self.p2(layers[2])
        l3 = self.d3(self.p3(layers[3]))
        r = [self.rn[i](l) for i, l in enumerate([l0, l1, l2, l3])]
        path4 = self.refine4(r[3])[:, :, : r[2].shape[2], : r[2].shape[3]]
        path3 = self.refine3(path4, r[2])
        path2 = self.refine2(path3, r[1])
        path1 = self.refine1(path2, r[0])
        return path1


def t2j_conv(conv):
    out = {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))}
    if conv.bias is not None:
        out["bias"] = jnp.asarray(conv.bias.detach().numpy())
    return out


def t2j_patch_expand(tconv, k, out_ch):
    w = tconv.weight.detach().numpy()
    in_ch = w.shape[0]
    return {
        "expand": {
            "kernel": jnp.asarray(w.transpose(0, 2, 3, 1).reshape(in_ch, k * k * out_ch)),
            "bias": jnp.asarray(np.tile(tconv.bias.detach().numpy(), k * k)),
        }
    }


def t2j_rcu(m):
    return {"conv1": t2j_conv(m.conv1), "conv2": t2j_conv(m.conv2)}


def t2j_fusion(m):
    return {
        "resConfUnit1": t2j_rcu(m.resConfUnit1),
        "resConfUnit2": t2j_rcu(m.resConfUnit2),
        "out_conv": t2j_conv(m.out_conv),
    }


def t2j_trunk(tm, layer_dims=(8, 12, 16, 20)):
    return {
        "act_0_proj": t2j_conv(tm.p0),
        "act_0_up": t2j_patch_expand(tm.u0, 4, layer_dims[0]),
        "act_1_proj": t2j_conv(tm.p1),
        "act_1_up": t2j_patch_expand(tm.u1, 2, layer_dims[1]),
        "act_2_proj": t2j_conv(tm.p2),
        "act_3_proj": t2j_conv(tm.p3),
        "act_3_down": t2j_conv(tm.d3),
        "layer1_rn": t2j_conv(tm.rn[0]),
        "layer2_rn": t2j_conv(tm.rn[1]),
        "layer3_rn": t2j_conv(tm.rn[2]),
        "layer4_rn": t2j_conv(tm.rn[3]),
        "refinenet4": t2j_fusion(tm.refine4),
        "refinenet3": t2j_fusion(tm.refine3),
        "refinenet2": t2j_fusion(tm.refine2),
        "refinenet1": t2j_fusion(tm.refine1),
    }


def make_tokens(rng, b, nh, nw, dims):
    return [rng.normal(size=(b, nh * nw, d)).astype(np.float32) for d in dims]


def test_pts3d_head_parity():
    rng = np.random.default_rng(4)
    dims = (ENC_DIM, DEC_DIM, DEC_DIM, DEC_DIM)
    nh = nw = H // 16
    tokens = make_tokens(rng, 2, nh, nw, dims)

    class TorchPts3d(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.trunk = TorchDPTTrunk(dims)
            self.c1 = torch.nn.Conv2d(FDIM, FDIM // 2, 3, 1, 1)
            self.c2 = torch.nn.Conv2d(FDIM // 2, 16, 3, 1, 1)
            self.c3 = torch.nn.Conv2d(16, 3, 1)

        def forward(self, tokens, nh, nw):
            x = self.trunk(tokens, nh, nw)
            x = self.c1(x)
            x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
            x = self.c3(F.relu(self.c2(x)))
            xyz = x.permute(0, 2, 3, 1)
            d = xyz.norm(dim=-1, keepdim=True)
            return xyz / d.clip(min=1e-8) * torch.expm1(d)

    tm = TorchPts3d().eval()
    with torch.no_grad():
        expected = tm([torch.from_numpy(t) for t in tokens], nh, nw).numpy()

    jm = DPTPts3dHead(hooks=HOOKS, feature_dim=FDIM, last_dim=16, layer_dims=(8, 12, 16, 20))
    params = {
        "trunk": t2j_trunk(tm.trunk),
        "head_conv1": t2j_conv(tm.c1),
        "head_conv2": t2j_conv(tm.c2),
        "head_conv3": t2j_conv(tm.c3),
    }
    got = jm.apply({"params": params}, [jnp.asarray(t) for t in tokens], (H, W))
    assert got.shape == (2, H, W, 3)
    np.testing.assert_allclose(got, expected, atol=3e-5)


def test_gs_head_parity():
    rng = np.random.default_rng(5)
    dims = (ENC_DIM, DEC_DIM, DEC_DIM, DEC_DIM)
    nh = nw = H // 16
    tokens = make_tokens(rng, 2, nh, nw, dims)
    imgs = rng.normal(size=(2, H, W, 3)).astype(np.float32)

    class TorchGS(torch.nn.Module):
        def __init__(self, out_ch):
            super().__init__()
            self.trunk = TorchDPTTrunk(dims)
            self.merger = torch.nn.Conv2d(3, FDIM, 7, 1, 3)
            self.h1 = torch.nn.Conv2d(FDIM, FDIM, 3, 1, 1, bias=False)
            self.h2 = torch.nn.Conv2d(FDIM, out_ch, 1)

        def forward(self, tokens, imgs, nh, nw):
            x = self.trunk(tokens, nh, nw)
            x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
            x = x + F.relu(self.merger(imgs))
            return self.h2(F.relu(self.h1(x))).permute(0, 2, 3, 1)

    tm = TorchGS(8).eval()
    with torch.no_grad():
        expected = tm(
            [torch.from_numpy(t) for t in tokens],
            torch.from_numpy(imgs).permute(0, 3, 1, 2),
            nh,
            nw,
        ).numpy()

    jm = DPTGSHead(out_channels=8, hooks=HOOKS, feature_dim=FDIM, layer_dims=(8, 12, 16, 20))
    params = {
        "trunk": t2j_trunk(tm.trunk),
        "input_merger": t2j_conv(tm.merger),
        "head": {"head_conv1": t2j_conv(tm.h1), "head_conv2": t2j_conv(tm.h2)},
    }
    got = jm.apply(
        {"params": params}, [jnp.asarray(t) for t in tokens], jnp.asarray(imgs), (H, W)
    )
    assert got.shape == (2, H, W, 8)
    np.testing.assert_allclose(got, expected, atol=3e-5)


def test_gs_sh_head_shape():
    rng = np.random.default_rng(6)
    dims = (ENC_DIM, DEC_DIM, DEC_DIM, DEC_DIM)
    nh = nw = H // 16
    tokens = [jnp.asarray(t) for t in make_tokens(rng, 1, nh, nw, dims)]
    import jax

    jm = DPTGSSHHead(out_channels=3, hooks=HOOKS, feature_dim=FDIM, layer_dims=(8, 12, 16, 20))
    params = jm.init(jax.random.key(0), tokens, (H, W))
    out = jm.apply(params, tokens, (H, W))
    assert out.shape == (1, H, W, 3)
