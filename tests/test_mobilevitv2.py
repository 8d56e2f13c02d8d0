"""Flax MobileViTV2 parity vs transformers (torch) — the 9th HF family.

The oracle is the installed transformers MobileViTV2ForSemanticSegmentation
(randomly initialized; no hub downloads in this environment), so logit parity
checks the full separable-attention backbone + DeepLabV3 head numerics.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models.mobilevitv2 import (MobileViTV2Seg,
                                         hf_mobilevitv2_torch_to_flax,
                                         mobilevitv2_dims)


def _torch_mobilevitv2(output_stride: int, width: float = 0.5,
                       n_classes: int = 7):
    from transformers import (MobileViTV2Config,
                              MobileViTV2ForSemanticSegmentation)

    torch.manual_seed(0)
    cfg = MobileViTV2Config(
        num_channels=5, image_size=64, width_multiplier=width,
        output_stride=output_stride, aspp_out_channels=64,
        num_labels=n_classes, attn_dropout=0.0, ffn_dropout=0.0,
        aspp_dropout_prob=0.0, classifier_dropout_prob=0.0,
    )
    m = MobileViTV2ForSemanticSegmentation(cfg)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


@pytest.mark.parametrize("output_stride", [16, 8, 32])
def test_mobilevitv2_logit_parity(output_stride, rng):
    tm = _torch_mobilevitv2(output_stride)
    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()

    variables = hf_mobilevitv2_torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    model = MobileViTV2Seg(width=0.5, classes=7, output_stride=output_stride,
                           aspp_channels=64)
    got = model.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert want.shape == (1, 7, 64 // output_stride, 64 // output_stride)
    assert got.shape == (1, 7, 64, 64)
    want_up = torch.nn.functional.interpolate(
        torch.from_numpy(want), size=(64, 64), mode="bilinear",
        align_corners=False).numpy()
    np.testing.assert_allclose(got, want_up, atol=5e-4, rtol=1e-3)


def test_mobilevitv2_width_dims_match_torch():
    """Channel plan equals transformers' make_divisible derivation per width."""
    from transformers import MobileViTV2Config, MobileViTV2Model

    for width in (0.5, 1.0, 1.5, 2.0):
        cfg = MobileViTV2Config(width_multiplier=width)
        tm = MobileViTV2Model(cfg, expand_output=False)
        dims = mobilevitv2_dims(width)
        assert tm.conv_stem.convolution.out_channels == dims["layer0"]
        sd = tm.state_dict()
        # last stage reduce conv of each encoder layer gives its out dim
        assert sd["encoder.layer.0.layer.0.reduce_1x1.convolution.weight"].shape[0] \
            == dims["layers"][0]
        assert sd["encoder.layer.1.layer.1.reduce_1x1.convolution.weight"].shape[0] \
            == dims["layers"][1]
        for i, (ld, ad) in enumerate(zip(dims["layers"][2:], dims["attn"]), start=2):
            assert sd[f"encoder.layer.{i}.downsampling_layer.reduce_1x1."
                      "convolution.weight"].shape[0] == ld
            assert sd[f"encoder.layer.{i}.conv_1x1.convolution.weight"].shape[0] == ad


def test_mobilevitv2_converter_strict_and_dispatch(rng, tmp_path):
    """Checkpoint round-trips the generic loader + strict validation."""
    from flairtpu.models import convert
    from flairtpu.models.factory import create_model, init_model

    tm = _torch_mobilevitv2(16)
    pth = tmp_path / "mvitv2.pth"
    torch.save(tm.state_dict(), pth)

    cfg = {"model_framework": {
        "model_provider": "HuggingFace",
        "HuggingFace": {"org_model": "apple/mobilevitv2-0.5-test-256"}},
        "n_classes": 7, "channels": [1, 2, 3, 4, 5]}
    model = create_model(cfg)
    assert isinstance(model, MobileViTV2Seg) and model.width == 0.5
    model = MobileViTV2Seg(width=0.5, classes=7, aspp_channels=64)
    params, stats = init_model(model, (1, 64, 64, 5))
    variables = convert.load_checkpoint_variables(
        pth, reference={"params": params, "batch_stats": stats}, strict=True)
    assert variables["params"]["classifier"]["conv"]["bias"].shape == (7,)
