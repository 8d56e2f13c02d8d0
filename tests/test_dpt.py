"""Flax DPT segmentation parity vs transformers' torch implementation."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models.dpt import DPTSeg, hf_dpt_torch_to_flax

CFG = dict(hidden=64, layers=6, heads=4, intermediate=128,
           out_indices=(1, 3, 4, 5), neck=(16, 24, 32, 48))


@pytest.fixture(scope="module")
def torch_dpt():
    from transformers import DPTConfig, DPTForSemanticSegmentation

    torch.manual_seed(0)
    cfg = DPTConfig(
        image_size=64, patch_size=16, num_channels=5,
        hidden_size=CFG["hidden"], num_hidden_layers=CFG["layers"],
        num_attention_heads=CFG["heads"], intermediate_size=CFG["intermediate"],
        backbone_out_indices=list(CFG["out_indices"]),
        neck_hidden_sizes=list(CFG["neck"]), fusion_hidden_size=32,
        is_hybrid=False, num_labels=7,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        semantic_classifier_dropout=0.0, attn_implementation="eager",
    )
    m = DPTForSemanticSegmentation(cfg)
    with torch.no_grad():
        m.dpt.embeddings.position_embeddings.uniform_(-0.2, 0.2)
        m.dpt.embeddings.cls_token.uniform_(-0.2, 0.2)
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


def _flax_model():
    return DPTSeg(spec="test", classes=7, trained_grid=4, fusion_dim=32, **CFG)


def test_dpt_logit_parity(torch_dpt, rng):
    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = torch_dpt(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()

    variables = hf_dpt_torch_to_flax(
        {k: v.numpy() for k, v in torch_dpt.state_dict().items()})
    got = _flax_model().apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    # DPT's fusion ladder ends at stride 2 and the head upsamples 2x, so the
    # torch logits are already full-resolution
    assert want.shape == (1, 7, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_dpt_pos_embed_interpolation(torch_dpt, rng):
    """96x96 input on a 64-trained model: pos embed grid 4x4 -> 6x6."""
    x = rng.standard_normal((1, 96, 96, 5), dtype=np.float32)
    with torch.no_grad():
        want = torch_dpt(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()
    variables = hf_dpt_torch_to_flax(
        {k: v.numpy() for k, v in torch_dpt.state_dict().items()})
    got = _flax_model().apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)
    assert want.shape == got.shape == (1, 7, 96, 96)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_dpt_dispatch(torch_dpt):
    from flairtpu.models.convert import any_state_dict_to_flax
    from flairtpu.models.factory import create_model

    sd = {k: v.numpy() for k, v in torch_dpt.state_dict().items()}
    got = any_state_dict_to_flax(sd)
    want = hf_dpt_torch_to_flax(dict(sd))
    assert set(got["params"]) == set(want["params"])

    cfg = {"model_framework": {
        "model_provider": "HuggingFace",
        "HuggingFace": {"org_model": "Intel/dpt-large-ade"}},
        "n_classes": 150, "channels": [1, 2, 3]}
    m = create_model(cfg)
    assert isinstance(m, DPTSeg)
    assert m.spec == "large" and m.trained_grid == 30

    mh = create_model({"model_framework": {
        "model_provider": "HuggingFace",
        "HuggingFace": {"org_model": "Intel/dpt-hybrid-midas"}},
        "n_classes": 150, "channels": [1, 2, 3]})
    assert isinstance(mh, DPTSeg) and mh.hybrid and mh.spec == "hybrid"


# --------------------------------------------------------------- hybrid

HCFG = dict(hidden=64, layers=6, heads=4, intermediate=128,
            out_indices=(3, 5), neck=(32, 48, 64, 64))
HBIT = dict(bit_depths=(1, 1, 2), bit_hidden=(32, 48, 64), bit_embed=16,
            bit_groups=8)


@pytest.fixture(scope="module")
def torch_dpt_hybrid():
    from transformers import DPTConfig, DPTForSemanticSegmentation

    torch.manual_seed(3)
    cfg = DPTConfig(
        image_size=64, patch_size=16, num_channels=3,
        hidden_size=HCFG["hidden"], num_hidden_layers=HCFG["layers"],
        num_attention_heads=HCFG["heads"],
        intermediate_size=HCFG["intermediate"],
        backbone_out_indices=[0, 1] + list(HCFG["out_indices"]),
        neck_hidden_sizes=list(HCFG["neck"]), fusion_hidden_size=32,
        is_hybrid=True, num_labels=7,
        backbone_featmap_shape=[1, HBIT["bit_hidden"][-1], 4, 4],
        reassemble_factors=[1, 1, 1, 0.5],
        backbone_config={
            "global_padding": "same", "layer_type": "bottleneck",
            "depths": list(HBIT["bit_depths"]),
            "hidden_sizes": list(HBIT["bit_hidden"]),
            "embedding_size": HBIT["bit_embed"],
            "num_groups": HBIT["bit_groups"],
            "out_features": ["stage1", "stage2", "stage3"],
            "embedding_dynamic_padding": True,
        },
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        semantic_classifier_dropout=0.0, attn_implementation="eager",
    )
    m = DPTForSemanticSegmentation(cfg)
    with torch.no_grad():
        m.dpt.embeddings.position_embeddings.uniform_(-0.2, 0.2)
        m.dpt.embeddings.cls_token.uniform_(-0.2, 0.2)
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


def _flax_hybrid():
    return DPTSeg(spec="test", classes=7, trained_grid=4, fusion_dim=32,
                  hybrid=True, **HCFG, **HBIT)


def test_dpt_hybrid_logit_parity(torch_dpt_hybrid, rng):
    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want = torch_dpt_hybrid(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()

    variables = hf_dpt_torch_to_flax(
        {k: v.numpy() for k, v in torch_dpt_hybrid.state_dict().items()})
    got = _flax_hybrid().apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (1, 7, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_dpt_hybrid_converter_strict(torch_dpt_hybrid):
    from flairtpu.models import convert

    sd = {k: v.numpy() for k, v in torch_dpt_hybrid.state_dict().items()}
    variables = hf_dpt_torch_to_flax(sd)
    m = _flax_hybrid()
    import jax

    init = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                  train=False)
    problems = convert.validate_against(
        variables, {"params": init["params"],
                    "batch_stats": init.get("batch_stats", {})}, strict=False)
    assert problems == []
