"""Parity tests for the multiview CroCo backbone and the token stylizer wiring
against a torch reference built from the same published architecture,
at tiny dims (the math is dimension-independent)."""

import jax.numpy as jnp
import numpy as np
import torch

from styl3r_tpu.models.croco import (
    MultiViewCrocoBackbone,
    TokenStylizer,
    generate_ctx_views,
)
from tests.test_vit import (
    TorchBlock,
    TorchDecoderBlock,
    t2j_block,
    t2j_decoder_block,
    t2j_layernorm,
    t2j_linear,
)

torch.manual_seed(1)

# Tiny configuration: 32x32 images, patch 16 -> 2x2=4 tokens (+1 intrinsics)
ENC_DIM, DEC_DIM, ENC_HEADS, DEC_HEADS = 32, 16, 2, 2
ENC_DEPTH, DEC_DEPTH = 2, 2
B, V, H, W = 2, 3, 32, 32


class TorchMultiViewBackbone(torch.nn.Module):
    """Reference wiring: shared encoder, intrinsics token, dual decoders."""

    def __init__(self):
        super().__init__()
        self.patch_proj = torch.nn.Conv2d(3, ENC_DIM, 16, 16)
        self.intrinsic_encoder = torch.nn.Linear(9, ENC_DIM)
        self.enc_blocks = torch.nn.ModuleList(
            [TorchBlock(ENC_DIM, ENC_HEADS, 100.0) for _ in range(ENC_DEPTH)]
        )
        self.enc_norm = torch.nn.LayerNorm(ENC_DIM, eps=1e-6)
        self.decoder_embed = torch.nn.Linear(ENC_DIM, DEC_DIM)
        self.dec_blocks = torch.nn.ModuleList(
            [TorchDecoderBlock(DEC_DIM, DEC_HEADS, 100.0) for _ in range(DEC_DEPTH)]
        )
        self.dec_blocks2 = torch.nn.ModuleList(
            [TorchDecoderBlock(DEC_DIM, DEC_HEADS, 100.0) for _ in range(DEC_DEPTH)]
        )
        self.dec_norm = torch.nn.LayerNorm(DEC_DIM, eps=1e-6)

    def encode(self, images, intrinsics):
        # images: (n, 3, h, w); intrinsics: (n, 3, 3)
        n = images.shape[0]
        x = self.patch_proj(images).flatten(2).transpose(1, 2)  # (n, L, C)
        gh, gw = images.shape[2] // 16, images.shape[3] // 16
        ys, xs = torch.meshgrid(torch.arange(gh), torch.arange(gw), indexing="ij")
        pos = torch.stack([ys, xs], -1).reshape(1, -1, 2).repeat(n, 1, 1)
        tok = self.intrinsic_encoder(intrinsics.reshape(n, 9))[:, None]
        x = torch.cat([x, tok], 1)
        extra = pos[:, :1].clone()
        extra[:, :, 0] += pos[:, -1, 0:1] + 1
        pos = torch.cat([pos, extra], 1)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos

    def forward(self, images, intrinsics):
        # images: (b, v, 3, h, w)
        b, v = images.shape[:2]
        feat, pos = self.encode(
            images.flatten(0, 1), intrinsics.flatten(0, 1)
        )
        l = feat.shape[1]
        feat = feat.reshape(b, v, l, ENC_DIM)
        pos = pos.reshape(b, v, l, 2)

        def ctx(x):
            outs = []
            for i in range(v):
                other = [x[:, j] for j in range(v) if j != i]
                outs.append(torch.cat(other, dim=1))
            return torch.stack(outs, dim=1)

        outputs = [feat]
        x = self.decoder_embed(feat)
        pos_ctx = ctx(pos)
        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            c = ctx(x)
            f0 = blk1(x[:, 0], c[:, 0], pos[:, 0], pos_ctx[:, 0])
            frs = [
                blk2(x[:, i], c[:, i], pos[:, i], pos_ctx[:, i])
                for i in range(1, v)
            ]
            x = torch.stack([f0] + frs, dim=1)
            outputs.append(x)
        outputs[-1] = self.dec_norm(outputs[-1])
        return feat, pos, [o[:, :, :-1] for o in outputs]


def backbone_params(tm):
    enc = {
        "patch_embed": {
            "proj": {
                "kernel": jnp.asarray(
                    tm.patch_proj.weight.detach().numpy().transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(tm.patch_proj.bias.detach().numpy()),
            }
        },
        "enc_norm": t2j_layernorm(tm.enc_norm),
    }
    for i, blk in enumerate(tm.enc_blocks):
        enc[f"enc_blocks_{i}"] = t2j_block(blk)
    params = {
        "encoder": enc,
        "intrinsic_encoder": t2j_linear(tm.intrinsic_encoder),
        "decoder_embed": t2j_linear(tm.decoder_embed),
        "dec_norm": t2j_layernorm(tm.dec_norm),
    }
    for i, blk in enumerate(tm.dec_blocks):
        params[f"dec_blocks_{i}"] = t2j_decoder_block(blk)
    for i, blk in enumerate(tm.dec_blocks2):
        params[f"dec_blocks2_{i}"] = t2j_decoder_block(blk)
    return params


def test_generate_ctx_views():
    x = jnp.arange(2 * 3 * 2 * 1).reshape(2, 3, 2, 1).astype(jnp.float32)
    ctx = generate_ctx_views(x)
    assert ctx.shape == (2, 3, 4, 1)
    # view 0's memory is views 1 then 2
    np.testing.assert_allclose(ctx[0, 0, :, 0], np.concatenate([x[0, 1, :, 0], x[0, 2, :, 0]]))
    # view 1's memory is views 0 then 2
    np.testing.assert_allclose(ctx[0, 1, :, 0], np.concatenate([x[0, 0, :, 0], x[0, 2, :, 0]]))


def test_multiview_backbone_parity():
    rng = np.random.default_rng(2)
    images = rng.normal(size=(B, V, H, W, 3)).astype(np.float32)
    intrinsics = rng.normal(size=(B, V, 3, 3)).astype(np.float32)

    tm = TorchMultiViewBackbone().eval()
    with torch.no_grad():
        tfeat, tpos, tdec = tm(
            torch.from_numpy(images).permute(0, 1, 4, 2, 3),
            torch.from_numpy(intrinsics),
        )

    jm = MultiViewCrocoBackbone(
        enc_depth=ENC_DEPTH,
        dec_depth=DEC_DEPTH,
        enc_dim=ENC_DIM,
        dec_dim=DEC_DIM,
        enc_heads=ENC_HEADS,
        dec_heads=DEC_HEADS,
    )
    params = {"params": backbone_params(tm)}
    jfeat, jpos, jdec = jm.apply(params, jnp.asarray(images), jnp.asarray(intrinsics))

    np.testing.assert_allclose(jfeat, tfeat.numpy(), atol=3e-5)
    np.testing.assert_array_equal(jpos, tpos.numpy())
    assert len(jdec) == len(tdec) == DEC_DEPTH + 1
    for jd, td in zip(jdec, tdec):
        np.testing.assert_allclose(jd, td.numpy(), atol=5e-5)


class TorchTokenStylizer(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_proj = torch.nn.Conv2d(3, ENC_DIM, 16, 16)
        self.enc_blocks = torch.nn.ModuleList(
            [TorchBlock(ENC_DIM, ENC_HEADS, 100.0) for _ in range(ENC_DEPTH)]
        )
        self.enc_norm = torch.nn.LayerNorm(ENC_DIM, eps=1e-6)
        self.decoder_embed = torch.nn.Linear(ENC_DIM, DEC_DIM)
        self.dec_blocks = torch.nn.ModuleList(
            [TorchDecoderBlock(DEC_DIM, DEC_HEADS, 100.0) for _ in range(DEC_DEPTH)]
        )
        self.dec_norm = torch.nn.LayerNorm(DEC_DIM, eps=1e-6)

    def forward(self, style, content_feat, content_pos):
        n = style.shape[0]
        x = self.patch_proj(style).flatten(2).transpose(1, 2)
        gh, gw = style.shape[2] // 16, style.shape[3] // 16
        ys, xs = torch.meshgrid(torch.arange(gh), torch.arange(gw), indexing="ij")
        spos = torch.stack([ys, xs], -1).reshape(1, -1, 2).repeat(n, 1, 1)
        for blk in self.enc_blocks:
            x = blk(x, spos)
        style_feat = self.enc_norm(x)

        b, v, l, _ = content_feat.shape
        outputs = [content_feat]
        cf = self.decoder_embed(content_feat.reshape(b, v * l, -1))
        cp = content_pos.reshape(b, v * l, 2)
        y = self.decoder_embed(style_feat)
        for blk in self.dec_blocks:
            cf = blk(cf, y, cp, spos)
            outputs.append(cf.reshape(b, v, l, -1))
        outputs[-1] = self.dec_norm(cf).reshape(b, v, l, -1)
        return [o[:, :, :-1] for o in outputs]


def test_token_stylizer_parity():
    rng = np.random.default_rng(3)
    style = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    l = 5  # 4 grid tokens + intrinsics token
    content_feat = rng.normal(size=(B, V, l, ENC_DIM)).astype(np.float32)
    content_pos = np.tile(
        np.array([[0, 0], [0, 1], [1, 0], [1, 1], [2, 0]], dtype=np.int64),
        (B, V, 1, 1),
    )

    tm = TorchTokenStylizer().eval()
    with torch.no_grad():
        tdec = tm(
            torch.from_numpy(style).permute(0, 3, 1, 2),
            torch.from_numpy(content_feat),
            torch.from_numpy(content_pos),
        )

    jm = TokenStylizer(
        enc_depth=ENC_DEPTH,
        dec_depth=DEC_DEPTH,
        enc_dim=ENC_DIM,
        dec_dim=DEC_DIM,
        enc_heads=ENC_HEADS,
        dec_heads=DEC_HEADS,
    )
    enc = {
        "patch_embed": {
            "proj": {
                "kernel": jnp.asarray(
                    tm.patch_proj.weight.detach().numpy().transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(tm.patch_proj.bias.detach().numpy()),
            }
        },
        "enc_norm": t2j_layernorm(tm.enc_norm),
    }
    for i, blk in enumerate(tm.enc_blocks):
        enc[f"enc_blocks_{i}"] = t2j_block(blk)
    params = {
        "encoder": enc,
        "decoder_embed": t2j_linear(tm.decoder_embed),
        "dec_norm": t2j_layernorm(tm.dec_norm),
    }
    for i, blk in enumerate(tm.dec_blocks):
        params[f"dec_blocks_{i}"] = t2j_decoder_block(blk)

    jdec = jm.apply(
        {"params": params},
        jnp.asarray(style),
        jnp.asarray(content_feat),
        jnp.asarray(content_pos),
    )
    assert len(jdec) == len(tdec) == DEC_DEPTH + 1
    for jd, td in zip(jdec, tdec):
        np.testing.assert_allclose(jd, td.numpy(), atol=5e-5)
