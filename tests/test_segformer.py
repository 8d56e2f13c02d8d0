"""Flax SegFormer parity vs transformers' torch implementation (no downloads:
both sides built from config with random weights, ours loaded via converter)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models.segformer import (
    SEGFORMER_SPECS,
    SegformerModel,
    create_hf_model,
    hf_torch_to_flax,
)


@pytest.fixture(scope="module")
def torch_segformer():
    from transformers import SegformerConfig, SegformerForSemanticSegmentation

    torch.manual_seed(0)
    spec = SEGFORMER_SPECS["b0"]
    cfg = SegformerConfig(
        num_channels=5,
        num_encoder_blocks=4,
        depths=list(spec["depths"]),
        sr_ratios=list(spec["srs"]),
        hidden_sizes=list(spec["dims"]),
        num_attention_heads=list(spec["heads"]),
        decoder_hidden_size=spec["dec"],
        num_labels=7,
    )
    m = SegformerForSemanticSegmentation(cfg)
    with torch.no_grad():  # randomize BN stats so inference exercises them
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


def test_segformer_logit_parity(torch_segformer, rng):
    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = torch_segformer(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()

    sd = {k: v.numpy() for k, v in torch_segformer.state_dict().items()}
    variables = hf_torch_to_flax(sd)
    fm = SegformerModel(spec="b0", classes=7, upsample_logits=False)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (1, 7, 16, 16)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_segformer_upsampled_output(torch_segformer, rng):
    sd = {k: v.numpy() for k, v in torch_segformer.state_dict().items()}
    variables = hf_torch_to_flax(sd)
    fm = SegformerModel(spec="b0", classes=7, upsample_logits=True)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 5), dtype=np.float32))
    out = fm.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 7)


def test_create_hf_model_dispatch():
    m = create_hf_model("nvidia/segformer-b2-finetuned-ade-512-512", 19, jnp.float32)
    assert m.spec == "b2" and m.classes == 19
    m2 = create_hf_model("nvidia/mit-b5", 13, jnp.float32)
    assert m2.spec == "b5"
    from flairtpu.models.swin_upernet import SwinUperNet

    m3 = create_hf_model("openmmlab/upernet-swin-small", 19, jnp.float32)
    assert isinstance(m3, SwinUperNet) and m3.spec == "small"
    from flairtpu.models.beit_upernet import BeitUperNet

    m4 = create_hf_model("openmmlab/upernet-beit-base", 19, jnp.float32)
    assert isinstance(m4, BeitUperNet)
    with pytest.raises(NotImplementedError, match="not ported"):
        create_hf_model("openmmlab/upernet-beit-giant", 19, jnp.float32)


def test_hf_pth_loads_strict(torch_segformer, tmp_path):
    """A local HF .pth round-trips through the generic checkpoint loader."""
    from flairtpu.models import convert
    from flairtpu.models.factory import init_model

    pth = tmp_path / "segformer_b0.pth"
    torch.save(torch_segformer.state_dict(), pth)
    fm = SegformerModel(spec="b0", classes=7)
    params, stats = init_model(fm, (1, 64, 64, 5))
    variables = convert.load_checkpoint_variables(
        pth, {"params": params, "batch_stats": stats}, strict=True)
    assert "encoder" in variables["params"]


def test_factory_hf_provider():
    from flairtpu.models.factory import create_model

    cfg = {
        "model_framework": {
            "model_provider": "HuggingFace",
            "HuggingFace": {"org_model": "nvidia/segformer-b0-finetuned-ade-512-512"},
        },
        "n_classes": 19,
        "channels": [1, 2, 3],
    }
    m = create_model(cfg)
    assert isinstance(m, SegformerModel)
