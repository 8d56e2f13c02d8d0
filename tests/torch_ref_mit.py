"""Test-only torch mirror of smp's Mix-Vision-Transformer encoder.

smp/encoders/mix_transformer.py vendors NVlabs' SegFormer backbone; smp is
not installed here, so this mirror reconstructs the exact state-dict
surface (``encoder.patch_embed{s}.*``, ``encoder.block{s}.{j}.*`` with the
fused ``kv`` linear, ``encoder.norm{s}.*``) and numerics.

Unlike the other smp mirrors, this one has a REAL installed oracle: the
backbone is numerically identical to transformers' SegformerModel (both
derive from the NVlabs code), and test_mit.py loads this mirror's weights
into the installed SegformerModel by key-rename and asserts feature
parity — so a deviation from the true smp encoder cannot pass silently.
"""

from __future__ import annotations

import torch
import torch.nn as nn

from tests import torch_ref

# embed dims / depths / heads / sr ratios per variant (smp's vendored specs,
# identical to transformers SegformerConfig for nvidia/mit-b*)
MIT_SPECS = {
    "mit_b0": ((32, 64, 160, 256), (2, 2, 2, 2)),
    "mit_b1": ((64, 128, 320, 512), (2, 2, 2, 2)),
    "mit_b2": ((64, 128, 320, 512), (3, 4, 6, 3)),
    "mit_b3": ((64, 128, 320, 512), (3, 4, 18, 3)),
    "mit_b4": ((64, 128, 320, 512), (3, 8, 27, 3)),
    "mit_b5": ((64, 128, 320, 512), (3, 6, 40, 3)),
}
MIT_HEADS = (1, 2, 5, 8)
MIT_SRS = (8, 4, 2, 1)


class DWConv(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x, H, W):
        B, N, C = x.shape
        x = x.transpose(1, 2).view(B, C, H, W)
        x = self.dwconv(x)
        return x.flatten(2).transpose(1, 2)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.dwconv = DWConv(hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, H, W):
        return self.fc2(self.act(self.dwconv(self.fc1(x), H, W)))


class Attention(nn.Module):
    def __init__(self, dim, heads, sr_ratio):
        super().__init__()
        self.heads, self.sr_ratio = heads, sr_ratio
        self.scale = (dim // heads) ** -0.5
        self.q = nn.Linear(dim, dim, bias=True)
        self.kv = nn.Linear(dim, dim * 2, bias=True)
        self.proj = nn.Linear(dim, dim)
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, sr_ratio, sr_ratio)
            self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, H, W):
        B, N, C = x.shape
        h, d = self.heads, C // self.heads
        q = self.q(x).reshape(B, N, h, d).permute(0, 2, 1, 3)
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = self.sr(x.permute(0, 2, 1).reshape(B, C, H, W))
            kv_in = self.norm(kv_in.reshape(B, C, -1).permute(0, 2, 1))
        kv = self.kv(kv_in).reshape(B, -1, 2, h, d).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class Block(nn.Module):
    def __init__(self, dim, heads, sr_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads, sr_ratio)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, dim * 4)

    def forward(self, x, H, W):
        x = x + self.attn(self.norm1(x), H, W)
        return x + self.mlp(self.norm2(x), H, W)


class OverlapPatchEmbed(nn.Module):
    def __init__(self, in_ch, dim, kernel, stride):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, dim, kernel, stride, kernel // 2)
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.proj(x)
        _, _, H, W = x.shape
        return self.norm(x.flatten(2).transpose(1, 2)), H, W


class MiTEncoderTorch(nn.Module):
    """smp MixVisionTransformerEncoder mirror: smp key names, 6 features
    with the zero-channel stride-2 dummy (smp's forward)."""

    def __init__(self, name: str = "mit_b0", depth: int = 5):
        super().__init__()
        dims, depths = MIT_SPECS[name]
        self.depth = depth
        in_ch = 3
        # stages truncated at depth like the other mirrors so reduced-depth
        # key sets match (smp keeps the full backbone in the state dict)
        for s in range(min(4, depth - 1)):
            setattr(self, f"patch_embed{s + 1}",
                    OverlapPatchEmbed(in_ch, dims[s], 7 if s == 0 else 3,
                                      4 if s == 0 else 2))
            setattr(self, f"block{s + 1}", nn.ModuleList(
                [Block(dims[s], MIT_HEADS[s], MIT_SRS[s])
                 for _ in range(depths[s])]))
            setattr(self, f"norm{s + 1}", nn.LayerNorm(dims[s], eps=1e-6))
            in_ch = dims[s]

    def forward(self, x):
        B, _, H0, W0 = x.shape
        dummy = torch.empty(B, 0, H0 // 2, W0 // 2, dtype=x.dtype,
                            device=x.device)
        feats = [x, dummy]
        y = x
        for s in range(min(4, self.depth - 1)):
            y, H, W = getattr(self, f"patch_embed{s + 1}")(y)
            for blk in getattr(self, f"block{s + 1}"):
                y = blk(y, H, W)
            y = getattr(self, f"norm{s + 1}")(y)
            y = y.reshape(B, H, W, -1).permute(0, 3, 1, 2).contiguous()
            feats.append(y)
        return feats


def mit_channels(name: str) -> tuple[int, ...]:
    """smp out_channels[1:]: (0, *embed_dims)."""
    return (0,) + MIT_SPECS[name][0]


class MiTUnet(nn.Module):
    """smp.create_model('unet', 'mit_b*', ...) mirror (manifest shape)."""

    def __init__(self, name="mit_b0", in_channels=3, classes=13):
        super().__init__()
        assert in_channels == 3  # smp set_in_channels raises otherwise
        self.encoder = MiTEncoderTorch(name)
        self.decoder = torch_ref.UnetDecoder(encoder_channels=mit_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class MiTFPN(nn.Module):
    def __init__(self, name="mit_b0", classes=7):
        super().__init__()
        self.encoder = MiTEncoderTorch(name)
        self.decoder = torch_ref.FPNDecoder(encoder_channels=mit_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(128, classes, 1), nn.UpsamplingBilinear2d(scale_factor=4))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class MiTMAnet(nn.Module):
    def __init__(self, name="mit_b0", classes=7):
        super().__init__()
        self.encoder = MiTEncoderTorch(name)
        self.decoder = torch_ref.MAnetDecoder(encoder_channels=mit_channels(name))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


class MiTPSPNet(nn.Module):
    def __init__(self, name="mit_b0", classes=7):
        super().__init__()
        self.encoder = MiTEncoderTorch(name, depth=3)
        self.decoder = torch_ref.PSPDecoder(in_ch=mit_channels(name)[2])
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(512, classes, 3, padding=1),
            nn.UpsamplingBilinear2d(scale_factor=8))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))
