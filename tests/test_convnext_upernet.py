"""Flax ConvNeXt-UperNet parity vs transformers' torch implementation."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models.convnext_upernet import (
    ConvNextUperNet,
    hf_convnext_upernet_torch_to_flax,
)


@pytest.fixture(scope="module")
def torch_convnext_upernet():
    from transformers import ConvNextConfig, UperNetConfig, UperNetForSemanticSegmentation

    torch.manual_seed(0)
    backbone = ConvNextConfig(
        num_channels=5,
        hidden_sizes=[96, 192, 384, 768],
        depths=[3, 3, 9, 3],
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    cfg = UperNetConfig(backbone_config=backbone, num_labels=7,
                        use_auxiliary_head=True)
    m = UperNetForSemanticSegmentation(cfg)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


def test_convnext_upernet_logit_parity(torch_convnext_upernet, rng):
    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = torch_convnext_upernet(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()

    sd = {k: v.numpy() for k, v in torch_convnext_upernet.state_dict().items()}
    variables = hf_convnext_upernet_torch_to_flax(sd)
    fm = ConvNextUperNet(spec="tiny", classes=7)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (1, 7, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_convnext_pth_loads_via_generic_loader(torch_convnext_upernet, tmp_path):
    from flairtpu.models import convert
    from flairtpu.models.factory import init_model

    pth = tmp_path / "convnext_upernet.pth"
    torch.save(torch_convnext_upernet.state_dict(), pth)
    fm = ConvNextUperNet(spec="tiny", classes=7)
    params, stats = init_model(fm, (1, 64, 64, 5))
    variables = convert.load_checkpoint_variables(
        pth, {"params": params, "batch_stats": stats}, strict=True)
    assert "backbone" in variables["params"]


def test_convnext_dispatch():
    from flairtpu.models.segformer import create_hf_model

    m = create_hf_model("openmmlab/upernet-convnext-tiny", 19, jnp.float32)
    assert isinstance(m, ConvNextUperNet) and m.spec == "tiny"
