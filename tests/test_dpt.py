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

    with pytest.raises(NotImplementedError):
        create_model({"model_framework": {
            "model_provider": "HuggingFace",
            "HuggingFace": {"org_model": "Intel/dpt-hybrid-ade"}},
            "n_classes": 150, "channels": [1, 2, 3]})
