"""Flax Swin-UperNet parity vs transformers' torch implementation."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models.swin_upernet import (
    SWIN_SPECS,
    SwinUperNet,
    hf_upernet_torch_to_flax,
)


@pytest.fixture(scope="module")
def torch_upernet():
    from transformers import SwinConfig, UperNetConfig, UperNetForSemanticSegmentation

    torch.manual_seed(0)
    spec = SWIN_SPECS["tiny"]
    backbone = SwinConfig(
        image_size=64,
        num_channels=5,
        embed_dim=spec["embed_dim"],
        depths=list(spec["depths"]),
        num_heads=list(spec["heads"]),
        window_size=spec["window"],
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    cfg = UperNetConfig(backbone_config=backbone, num_labels=7,
                        use_auxiliary_head=True)
    m = UperNetForSemanticSegmentation(cfg)
    with torch.no_grad():
        # randomize: HF zero-inits relative bias tables and BN stats are trivial
        for name, p in m.named_parameters():
            if "relative_position_bias_table" in name:
                p.uniform_(-0.2, 0.2)
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


def test_swin_upernet_logit_parity(torch_upernet, rng):
    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = torch_upernet(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()

    sd = {k: v.numpy() for k, v in torch_upernet.state_dict().items()}
    variables = hf_upernet_torch_to_flax(sd)
    fm = SwinUperNet(spec="tiny", classes=7)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (1, 7, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_swin_upernet_aux_head(torch_upernet, rng):
    sd = {k: v.numpy() for k, v in torch_upernet.state_dict().items()}
    variables = hf_upernet_torch_to_flax(sd)
    fm = SwinUperNet(spec="tiny", classes=7)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 5), dtype=np.float32))
    logits, aux = fm.apply(variables, x, train=False, return_aux=True)
    assert logits.shape == aux.shape == (1, 64, 64, 7)
