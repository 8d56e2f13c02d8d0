"""HF-provider pretrained init from LOCAL transformers checkpoints.

The reference's HuggingFace path always starts pretrained:
``AutoModelForSemanticSegmentation.from_pretrained(org_model, num_labels=...,
ignore_mismatched_sizes=True)`` (ref src/flair/model.py:43-50). These tests
pin flairtpu's ``init_hf_pretrained`` equivalent against the INSTALLED
transformers loading the same ``save_pretrained`` directory — a real oracle,
no downloads: the checkpoints are locally constructed random-weight models.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models.factory import init_model
from flairtpu.models.hf_pretrained import (
    _flatten,
    init_hf_from_pretrained,
    load_hf_state_dict,
    resolve_hf_checkpoint,
)


def _save(m, d, **kw):
    m.save_pretrained(str(d), **kw)
    return str(d)


def _oracle_logits(ckpt_dir, x_nchw, num_labels):
    """The reference's exact model construction on the saved dir."""
    from transformers import AutoConfig, AutoModelForSemanticSegmentation

    cfg = AutoConfig.from_pretrained(ckpt_dir, num_labels=num_labels)
    m = AutoModelForSemanticSegmentation.from_pretrained(
        ckpt_dir, config=cfg, ignore_mismatched_sizes=True)
    m.eval()
    with torch.no_grad():
        return m(torch.from_numpy(x_nchw)).logits.numpy()


# ---------------------------------------------------------------- segformer

@pytest.fixture(scope="module")
def segformer_ckpt(tmp_path_factory):
    from transformers import SegformerConfig, SegformerForSemanticSegmentation

    from flairtpu.models.segformer import SEGFORMER_SPECS

    torch.manual_seed(0)
    spec = SEGFORMER_SPECS["b0"]
    cfg = SegformerConfig(
        num_channels=5, num_encoder_blocks=4, depths=list(spec["depths"]),
        sr_ratios=list(spec["srs"]), hidden_sizes=list(spec["dims"]),
        num_attention_heads=list(spec["heads"]),
        decoder_hidden_size=spec["dec"], num_labels=7)
    m = SegformerForSemanticSegmentation(cfg)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    return _save(m, tmp_path_factory.mktemp("segformer_b0"))


def test_segformer_parity_vs_transformers_from_pretrained(segformer_ckpt, rng):
    from flairtpu.models.segformer import SegformerModel

    fm = SegformerModel(spec="b0", classes=7, upsample_logits=False)
    params, stats = init_model(fm, (1, 64, 64, 5))
    variables, rep = init_hf_from_pretrained(
        segformer_ckpt, {"params": params, "batch_stats": stats})
    assert not rep["reinitialized"] and not rep["unused"]

    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    want = _oracle_logits(segformer_ckpt, np.moveaxis(x, -1, 1).copy(), 7)
    got = np.moveaxis(
        np.asarray(fm.apply(variables, jnp.asarray(x), train=False)), -1, 1)
    assert got.shape == want.shape == (1, 7, 16, 16)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_bin_serialization_equals_safetensors(segformer_ckpt, tmp_path):
    """pytorch_model.bin resolution + loading matches the safetensors path."""
    from transformers import AutoModelForSemanticSegmentation

    m = AutoModelForSemanticSegmentation.from_pretrained(segformer_ckpt)
    d = _save(m, tmp_path / "bin_ckpt", safe_serialization=False)
    assert resolve_hf_checkpoint(d).name == "pytorch_model.bin"
    assert resolve_hf_checkpoint(segformer_ckpt).name == "model.safetensors"
    a = load_hf_state_dict(segformer_ckpt)
    b = load_hf_state_dict(d)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_head_mismatch_keeps_fresh_init(segformer_ckpt):
    """num_labels mismatch: classifier stays at the model's fresh random init
    (transformers' ignore_mismatched_sizes), everything else loads."""
    from flairtpu.models.segformer import SegformerModel

    fm = SegformerModel(spec="b0", classes=5, upsample_logits=False)
    params, stats = init_model(fm, (1, 64, 64, 5))
    variables, rep = init_hf_from_pretrained(
        segformer_ckpt, {"params": params, "batch_stats": stats})
    assert sorted(rep["reinitialized"]) == [
        "params/decode_head/classifier/bias",
        "params/decode_head/classifier/kernel",
    ]
    fresh = _flatten(params)
    merged = _flatten(variables["params"])
    loaded_sd = load_hf_state_dict(segformer_ckpt)
    n_diff = 0
    for key, v in merged.items():
        name = "/".join(key)
        if "classifier" in name:
            np.testing.assert_array_equal(np.asarray(v), np.asarray(fresh[key]))
        else:
            n_diff += not np.array_equal(np.asarray(v), np.asarray(fresh[key]))
    # the checkpoint genuinely replaced the non-head tree (only kernels can
    # differ: fresh biases/LN leaves are zeros/ones on both sides)
    assert n_diff > 50
    assert len(loaded_sd) > 0
    out = fm.apply(variables, jnp.zeros((1, 64, 64, 5), jnp.float32), train=False)
    assert out.shape == (1, 16, 16, 5)


def test_wrong_family_checkpoint_raises(segformer_ckpt):
    from flairtpu.models.swin_upernet import SwinUperNet

    fm = SwinUperNet(spec="tiny", classes=7)
    params, stats = init_model(fm, (1, 64, 64, 5))
    with pytest.raises(ValueError, match="wrong family or size"):
        init_hf_from_pretrained(
            segformer_ckpt, {"params": params, "batch_stats": stats})


# ------------------------------------------------------------- swin-upernet

def test_swin_upernet_from_pretrained_dir(tmp_path, rng):
    from transformers import (SwinConfig, UperNetConfig,
                              UperNetForSemanticSegmentation)

    from flairtpu.models.swin_upernet import SWIN_SPECS, SwinUperNet

    torch.manual_seed(1)
    spec = SWIN_SPECS["tiny"]
    backbone = SwinConfig(
        image_size=64, num_channels=5, embed_dim=spec["embed_dim"],
        depths=list(spec["depths"]), num_heads=list(spec["heads"]),
        window_size=spec["window"],
        out_features=["stage1", "stage2", "stage3", "stage4"])
    cfg = UperNetConfig(backbone_config=backbone, num_labels=7,
                        use_auxiliary_head=True)
    m = UperNetForSemanticSegmentation(cfg)
    with torch.no_grad():
        for name, p in m.named_parameters():
            if "relative_position_bias_table" in name:
                p.uniform_(-0.2, 0.2)
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    d = _save(m, tmp_path / "swin_tiny")

    fm = SwinUperNet(spec="tiny", classes=7)
    params, stats = init_model(fm, (1, 64, 64, 5))
    variables, rep = init_hf_from_pretrained(
        d, {"params": params, "batch_stats": stats})
    assert not rep["reinitialized"]

    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    want = _oracle_logits(d, np.moveaxis(x, -1, 1).copy(), 7)
    got = np.moveaxis(
        np.asarray(fm.apply(variables, jnp.asarray(x), train=False)), -1, 1)
    assert got.shape == want.shape == (1, 7, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


# --------------------------------------------------------------------- beit

def test_beit_upernet_from_pretrained_dir(tmp_path, rng):
    from transformers import BeitConfig, BeitForSemanticSegmentation

    from flairtpu.models.beit_upernet import BeitUperNet

    CFG = dict(hidden=64, layers=6, heads=4, intermediate=128,
               out_indices=(3, 4, 5, 6))
    torch.manual_seed(2)
    cfg = BeitConfig(
        image_size=64, patch_size=16, num_channels=5,
        hidden_size=CFG["hidden"], num_hidden_layers=CFG["layers"],
        num_attention_heads=CFG["heads"], intermediate_size=CFG["intermediate"],
        out_indices=list(CFG["out_indices"]),
        use_relative_position_bias=True, layer_scale_init_value=0.1,
        use_auxiliary_head=True, auxiliary_channels=32,
        num_labels=7, drop_path_rate=0.0, attn_implementation="eager")
    m = BeitForSemanticSegmentation(cfg)
    with torch.no_grad():
        for name, p in m.named_parameters():
            if "relative_position_bias_table" in name or "cls_token" in name:
                p.uniform_(-0.2, 0.2)
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    d = _save(m, tmp_path / "beit")

    fm = BeitUperNet(spec="base", classes=7, trained_window=4,
                     aux_channels=32, **CFG)
    params, stats = init_model(fm, (1, 64, 64, 5))
    variables, rep = init_hf_from_pretrained(
        d, {"params": params, "batch_stats": stats})
    assert not rep["reinitialized"]

    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    want = _oracle_logits(d, np.moveaxis(x, -1, 1).copy(), 7)
    got = np.moveaxis(
        np.asarray(fm.apply(variables, jnp.asarray(x), train=False)), -1, 1)
    # HF BeiT emits logits at 1/4 resolution; ours upsample to the input
    assert want.shape == (1, 7, 16, 16) and got.shape == (1, 7, 64, 64)
    want_up = torch.nn.functional.interpolate(
        torch.from_numpy(want), size=(64, 64), mode="bilinear",
        align_corners=False).numpy()
    np.testing.assert_allclose(got, want_up, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------- dpt

def test_dpt_from_pretrained_dir(tmp_path, rng):
    from transformers import DPTConfig, DPTForSemanticSegmentation

    from flairtpu.models.dpt import DPTSeg

    CFG = dict(hidden=64, layers=6, heads=4, intermediate=128,
               out_indices=(1, 3, 4, 5), neck=(16, 24, 32, 48))
    torch.manual_seed(3)
    cfg = DPTConfig(
        image_size=64, patch_size=16, num_channels=5,
        hidden_size=CFG["hidden"], num_hidden_layers=CFG["layers"],
        num_attention_heads=CFG["heads"], intermediate_size=CFG["intermediate"],
        backbone_out_indices=list(CFG["out_indices"]),
        neck_hidden_sizes=list(CFG["neck"]), fusion_hidden_size=32,
        is_hybrid=False, num_labels=7,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        semantic_classifier_dropout=0.0, attn_implementation="eager")
    m = DPTForSemanticSegmentation(cfg)
    with torch.no_grad():
        m.dpt.embeddings.position_embeddings.uniform_(-0.2, 0.2)
        m.dpt.embeddings.cls_token.uniform_(-0.2, 0.2)
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    m.eval()
    d = _save(m, tmp_path / "dpt")

    fm = DPTSeg(spec="test", classes=7, trained_grid=4, fusion_dim=32, **CFG)
    params, stats = init_model(fm, (1, 64, 64, 5))
    variables, rep = init_hf_from_pretrained(
        d, {"params": params, "batch_stats": stats})
    assert not rep["reinitialized"]

    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    want = _oracle_logits(d, np.moveaxis(x, -1, 1).copy(), 7)
    got = np.moveaxis(
        np.asarray(fm.apply(variables, jnp.asarray(x), train=False)), -1, 1)
    assert got.shape == want.shape == (1, 7, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


# -------------------------------------------------------------- fit() + cfg

def test_fit_from_hf_checkpoint(segformer_ckpt, tmp_path):
    """The train-config knob end to end: fit() starts from the checkpoint
    (with head surgery: toy classes=4 vs checkpoint num_labels=7)."""
    from flairtpu import config as cfgmod
    from flairtpu.data.manifest import gather_paths
    from flairtpu.train.loop import fit
    from tests.synth import toy_train_config

    config = toy_train_config(
        tmp_path, num_epochs=1,
        model_framework={
            "model_provider": "HuggingFace",
            "HuggingFace": {"org_model": "nvidia/segformer-b0-local-test"},
        },
        init_hf_pretrained=segformer_ckpt)
    config = cfgmod.validate_train_config(config)
    dict_train = gather_paths(config, "train")
    dict_val = gather_paths(config, "val")
    msgs = []
    trainer, info = fit(config, dict_train, dict_val, tmp_path / "out_hf",
                        progress=msgs.append)
    assert any("HF weights initialized" in m for m in msgs)
    assert np.isfinite(info["history"][-1]["train_loss"])


def test_config_rejects_smp_provider(tmp_path):
    from flairtpu import config as cfgmod
    from tests.synth import toy_train_config

    config = toy_train_config(tmp_path, init_hf_pretrained=str(tmp_path))
    with pytest.raises(cfgmod.ConfigError, match="HuggingFace provider only"):
        cfgmod.validate_train_config(config)


def test_config_rejects_missing_path(tmp_path):
    from flairtpu import config as cfgmod
    from tests.synth import toy_train_config

    config = toy_train_config(
        tmp_path,
        model_framework={
            "model_provider": "HuggingFace",
            "HuggingFace": {"org_model": "nvidia/segformer-b0-local-test"},
        },
        init_hf_pretrained=str(tmp_path / "nope"))
    with pytest.raises(cfgmod.ConfigError, match="not found"):
        cfgmod.validate_train_config(config)
