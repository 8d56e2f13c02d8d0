"""Flax BEiT-UperNet parity vs transformers' torch implementation."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models.beit_upernet import BeitUperNet, hf_beit_torch_to_flax

# tiny 6-layer config: out_indices must be 4 ints <= num layers (HF checks
# them against stage names)
CFG = dict(hidden=64, layers=6, heads=4, intermediate=128,
           out_indices=(3, 4, 5, 6))


@pytest.fixture(scope="module")
def torch_beit():
    from transformers import BeitConfig, BeitForSemanticSegmentation

    torch.manual_seed(0)
    cfg = BeitConfig(
        image_size=64, patch_size=16, num_channels=5,
        hidden_size=CFG["hidden"], num_hidden_layers=CFG["layers"],
        num_attention_heads=CFG["heads"], intermediate_size=CFG["intermediate"],
        out_indices=list(CFG["out_indices"]),
        use_relative_position_bias=True, layer_scale_init_value=0.1,
        use_auxiliary_head=True, auxiliary_channels=32,
        num_labels=7, drop_path_rate=0.0,
        attn_implementation="eager",
    )
    m = BeitForSemanticSegmentation(cfg)
    with torch.no_grad():
        # non-trivial rel-pos tables, lambdas and BN stats
        for name, p in m.named_parameters():
            if "relative_position_bias_table" in name or "cls_token" in name:
                p.uniform_(-0.2, 0.2)
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


def _flax_model():
    return BeitUperNet(spec="base", classes=7, trained_window=4,
                       aux_channels=32, **CFG)


def test_beit_upernet_logit_parity(torch_beit, rng):
    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = torch_beit(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()

    variables = hf_beit_torch_to_flax(
        {k: v.numpy() for k, v in torch_beit.state_dict().items()})
    got = _flax_model().apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    # HF emits logits at 1/4 resolution; ours upsample to the input
    assert want.shape == (1, 7, 16, 16)
    assert got.shape == (1, 7, 64, 64)
    want_up = torch.nn.functional.interpolate(
        torch.from_numpy(want), size=(64, 64), mode="bilinear",
        align_corners=False).numpy()
    np.testing.assert_allclose(got, want_up, atol=5e-4, rtol=1e-3)


def test_beit_aux_head_parity(torch_beit, rng):
    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    with torch.no_grad():
        outputs = torch_beit.beit(xt, output_hidden_states=True)
        hs = outputs.hidden_states
        feats = [h for i, h in enumerate(hs) if i + 1 in CFG["out_indices"]]
        feats = [h[:, 1:, :].permute(0, 2, 1).reshape(1, -1, 4, 4) for h in feats]
        ops = [torch_beit.fpn1, torch_beit.fpn2, torch_beit.fpn3, torch_beit.fpn4]
        feats = [op(f) for op, f in zip(ops, feats)]
        want = torch_beit.auxiliary_head(feats).numpy()

    variables = hf_beit_torch_to_flax(
        {k: v.numpy() for k, v in torch_beit.state_dict().items()})
    logits, aux = _flax_model().apply(variables, jnp.asarray(x), train=False,
                                      return_aux=True)
    aux = np.moveaxis(np.asarray(aux), -1, 1)
    want_up = torch.nn.functional.interpolate(
        torch.from_numpy(want), size=(64, 64), mode="bilinear",
        align_corners=False).numpy()
    np.testing.assert_allclose(aux, want_up, atol=5e-4, rtol=1e-3)


def test_beit_window_interpolation(torch_beit):
    """512-inputs on a 640-trained checkpoint resize the bias table; oracle is
    BeitRelativePositionBias.forward at a different runtime window."""
    from flairtpu.models.beit_upernet import BeitRelPosBias

    layer0 = torch_beit.beit.encoder.layer[0].attention.attention
    with torch.no_grad():
        want = layer0.relative_position_bias((6, 6)).numpy()[0]  # (heads, 37, 37)

    table = layer0.relative_position_bias.relative_position_bias_table.detach().numpy()
    mod = BeitRelPosBias(heads=CFG["heads"], trained_window=4)
    got = np.asarray(mod.apply({"params": {"table": table}}, 6))
    assert got.shape == want.shape == (CFG["heads"], 37, 37)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # larger input runs end-to-end through our model (HF's own seg head
    # cannot: it reshapes with config.image_size)
    variables = hf_beit_torch_to_flax(
        {k: v.numpy() for k, v in torch_beit.state_dict().items()})
    x = np.random.default_rng(0).standard_normal((1, 96, 96, 5)).astype(np.float32)
    got = np.asarray(_flax_model().apply(variables, jnp.asarray(x), train=False))
    assert got.shape == (1, 96, 96, 7) and np.isfinite(got).all()


def test_beit_factory_dispatch():
    from flairtpu.models.factory import create_model

    cfg = {"model_framework": {
        "model_provider": "HuggingFace",
        "HuggingFace": {"org_model": "microsoft/beit-base-finetuned-ade-640-640"}},
        "n_classes": 19, "channels": [1, 2, 3, 4, 5]}
    m = create_model(cfg)
    assert isinstance(m, BeitUperNet)
    assert m.spec == "base" and m.classes == 19


def test_any_state_dict_routes_beit(torch_beit):
    """Regression: BEiT checkpoints carry decode_head.* keys, which used to be
    mis-dispatched to the SegFormer converter by any_state_dict_to_flax."""
    from flairtpu.models.convert import any_state_dict_to_flax

    sd = {k: v.numpy() for k, v in torch_beit.state_dict().items()}
    want = hf_beit_torch_to_flax(dict(sd))
    got = any_state_dict_to_flax(sd)
    assert set(got["params"]) == set(want["params"])
    assert "backbone" in got["params"]  # beit layout, not segformer's


def test_data2vec_vision_parity(rng):
    """Data2Vec-Vision == BEiT modulo the data2vec_vision. key prefix
    (transformers modeling_data2vec_vision.py is copied from modeling_beit.py);
    full logit parity through the shared BeitUperNet port."""
    from transformers import (Data2VecVisionConfig,
                              Data2VecVisionForSemanticSegmentation)

    torch.manual_seed(1)
    cfg = Data2VecVisionConfig(
        image_size=64, patch_size=16, num_channels=5,
        hidden_size=CFG["hidden"], num_hidden_layers=CFG["layers"],
        num_attention_heads=CFG["heads"], intermediate_size=CFG["intermediate"],
        out_indices=list(CFG["out_indices"]),
        use_relative_position_bias=True, layer_scale_init_value=0.1,
        use_auxiliary_head=True, auxiliary_channels=32,
        num_labels=7, drop_path_rate=0.0,
        attn_implementation="eager",
    )
    tm = Data2VecVisionForSemanticSegmentation(cfg)
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "relative_position_bias_table" in name or "cls_token" in name:
                p.uniform_(-0.2, 0.2)
    tm.eval()

    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()

    from flairtpu.models.convert import any_state_dict_to_flax

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    assert any(k.startswith("data2vec_vision.") for k in sd)
    variables = any_state_dict_to_flax(sd)
    model = BeitUperNet(spec="base", classes=7, trained_window=4,
                        aux_channels=32, **CFG)
    got = model.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)
    want_up = torch.nn.functional.interpolate(
        torch.from_numpy(want), size=(64, 64), mode="bilinear",
        align_corners=False).numpy()
    np.testing.assert_allclose(got, want_up, atol=5e-4, rtol=1e-3)


def test_data2vec_factory_dispatch():
    from flairtpu.models.factory import create_model

    cfg = {"model_framework": {
        "model_provider": "HuggingFace",
        "HuggingFace": {"org_model": "facebook/data2vec-vision-base"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    assert isinstance(m, BeitUperNet)
    assert m.spec == "base" and m.classes == 5
