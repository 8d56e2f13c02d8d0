"""resnext101 width ladder (incl. Instagram-WSL 32x16d/32x32d/32x48d):
smp registers these natively (smp/encoders/resnet.py), so the factory must
dispatch them. Param totals pinned to the published torchvision/WSL values;
logit parity for 32x4d and 32x16d against the BottleneckEncoder mirror."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from flairtpu.models import convert
from flairtpu.models.factory import (FlairSegmentationModel, create_model,
                                     init_model)
from tests import torch_ref as tr

# torchvision resnext101_32x8d / facebookresearch WSL published totals (M)
TOTALS = {"resnext101_32x4d": 44.18, "resnext101_32x8d": 88.79,
          "resnext101_32x16d": 194.03, "resnext101_32x32d": 468.53,
          "resnext101_32x48d": 828.41}


class ResNeXt101Unet(nn.Module):
    def __init__(self, width, in_channels=3, classes=13):
        super().__init__()
        self.encoder = tr.BottleneckEncoder(in_channels, (3, 4, 23, 3),
                                            groups=32, base_width=width)
        self.decoder = tr.UnetDecoder(
            encoder_channels=(64, 256, 512, 1024, 2048))
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, classes, 3, padding=1))

    def forward(self, x):
        return self.segmentation_head(self.decoder(*self.encoder(x)))


@pytest.mark.parametrize("name", sorted(TOTALS))
def test_param_totals_match_published(name):
    width = int(name.rsplit("x", 1)[1][:-1])
    enc = tr.BottleneckEncoder(3, (3, 4, 23, 3), groups=32, base_width=width)
    total = sum(p.numel() for p in enc.parameters()) + 2048 * 1000 + 1000
    assert abs(total / 1e6 - TOTALS[name]) < 0.02, total / 1e6


@pytest.mark.parametrize("width", [4, 16])
def test_logit_parity(width, rng):
    torch.manual_seed(31)
    tm = ResNeXt101Unet(width, in_channels=4, classes=6)
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    tm.eval()

    x = rng.standard_normal((1, 64, 64, 4), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name=f"resnext101_32x{width}d",
                                arch="unet", classes=6, dtype=jnp.float32)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)
    assert got.shape == want.shape == (1, 6, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    params, stats = init_model(fm, (1, 64, 64, 4))
    problems = convert.validate_against(
        variables, {"params": params, "batch_stats": stats}, strict=False)
    assert problems == []


def test_factory_dispatch_all_widths():
    for name in sorted(TOTALS):
        cfg = {"model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {
                "encoder_decoder": f"{name}_unet"}},
            "n_classes": 5, "channels": [1, 2, 3]}
        assert create_model(cfg) is not None
