"""Model + converter tests: logit parity between Flax and the torch mirror."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import FlairSegmentationModel, create_model, init_model
from tests import torch_ref


def _torch_model(in_ch=5, classes=13, seed=0):
    torch.manual_seed(seed)
    m = torch_ref.ResNet34Unet(in_channels=in_ch, classes=classes)
    # randomize BN running stats so inference parity actually exercises them
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def _to_flax_variables(tm) -> dict:
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    return convert.torch_to_flax(convert.normalize_keys(sd))


def test_logit_parity_fp32(rng):
    """Core correctness anchor: fp32 logits match torch on a fixed input."""
    tm = _torch_model()
    x = rng.standard_normal((2, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    fm = FlairSegmentationModel(encoder_name="resnet34", classes=13, dtype=jnp.float32)
    variables = _to_flax_variables(tm)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (2, 13, 64, 64)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_converter_structure_matches_init():
    """Converted tree == init tree (the strict-load contract)."""
    tm = _torch_model(in_ch=3, classes=7)
    variables = _to_flax_variables(tm)
    fm = FlairSegmentationModel(encoder_name="resnet34", classes=7)
    params, stats = init_model(fm, (1, 32, 32, 3))
    problems = convert.validate_against(
        variables, {"params": params, "batch_stats": stats}, strict=False)
    assert problems == []


def test_converter_detects_class_mismatch():
    tm = _torch_model(in_ch=5, classes=13)
    variables = _to_flax_variables(tm)
    fm = FlairSegmentationModel(encoder_name="resnet34", classes=19)
    params, stats = init_model(fm, (1, 32, 32, 5))
    with pytest.raises(ValueError, match="segmentation_head"):
        convert.validate_against(variables, {"params": params, "batch_stats": stats})


def test_lightning_ckpt_prefix_and_mlp(tmp_path):
    """.ckpt with model.seg_model.* + model.enc.* loads, criterion dropped."""
    tm = _torch_model(in_ch=5, classes=13)
    mlp = torch_ref.MetadataMLP()
    sd = {f"model.seg_model.{k}": v for k, v in tm.state_dict().items()}
    sd.update({f"model.{k}": v for k, v in mlp.state_dict(prefix="enc.").items()})
    sd["criterion.weight"] = torch.ones(13)
    ckpt = tmp_path / "epoch.ckpt"
    torch.save({"state_dict": sd, "epoch": 3}, ckpt)

    variables = convert.load_checkpoint_variables(ckpt)
    assert "metadata_mlp" in variables["params"]
    assert variables["params"]["metadata_mlp"]["fc0"]["kernel"].shape == (45, 64)
    fm = FlairSegmentationModel(encoder_name="resnet34", classes=13, use_metadata=True)
    params, stats = init_model(fm, (1, 512, 512, 5))
    convert.validate_against(variables, {"params": params, "batch_stats": stats})


def test_metadata_mlp_parity(rng):
    """MLP output matches torch eval-mode forward after conversion."""
    mlp = torch_ref.MetadataMLP().eval()
    sd = {f"enc.{k}": v.detach().numpy() for k, v in mlp.state_dict().items()}
    variables = convert.torch_to_flax(sd)
    mtd = rng.standard_normal((4, 45), dtype=np.float32)
    with torch.no_grad():
        want = mlp(torch.from_numpy(mtd)).numpy()

    from flairtpu.models.metadata_mlp import MetadataMLP

    got = MetadataMLP().apply(
        {"params": variables["params"]["metadata_mlp"]}, jnp.asarray(mtd), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_metadata_fusion_matches_reference_repeat(rng):
    """Fusion rule == torch unsqueeze/repeat broadcast (model.py:56-62)."""
    from flairtpu.models.metadata_mlp import fuse_metadata

    feats = rng.standard_normal((2, 16, 16, 512), dtype=np.float32)
    emb = rng.standard_normal((2, 16), dtype=np.float32)
    t_feats = torch.from_numpy(np.moveaxis(feats, -1, 1).copy())  # NCHW
    t_emb = torch.from_numpy(emb)
    t_fused = t_feats + t_emb.unsqueeze(1).unsqueeze(-1).repeat(1, 512, 1, 16)
    got = fuse_metadata(jnp.asarray(feats), jnp.asarray(emb))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got), -1, 1), t_fused.numpy(), atol=1e-6)


def test_checkpoint_num_classes():
    tm = _torch_model(classes=15)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    assert convert.checkpoint_num_classes(sd) == 15


def test_factory_from_config():
    cfg = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"},
        },
        "classes": {i: [1, str(i)] for i in range(1, 14)},
        "use_metadata": False,
    }
    m = create_model(cfg)
    assert m.classes == 13 and m.encoder_name == "resnet34"
    with pytest.raises(NotImplementedError):
        create_model({
            "model_framework": {
                "model_provider": "SegmentationModelsPytorch",
                "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_segnet"},
            },
            "n_classes": 3,
        })


def test_resnet50_bottleneck_shapes():
    fm = FlairSegmentationModel(encoder_name="resnet50", classes=5)
    params, stats = init_model(fm, (1, 64, 64, 3))
    out = fm.apply({"params": params, "batch_stats": stats},
                   jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)


def test_flair_inc_shaped_checkpoint_512(tmp_path, rng):
    """Accuracy-anchor fixture (BASELINE.md): a full-size state dict shaped
    exactly like the published FLAIR-INC_rgb_15cl_resnet34-unet_weights.pth
    (configs/flair-1-config-detect.yaml:13 — 3-channel RGB, 15 classes, smp
    key set) loads through the production zone-detect path
    (train/checkpoints.load_pretrained, strict) and reproduces torch logits
    at the production 512^2 patch size. The day real weights appear, this
    path is already proven."""
    from flairtpu.train.checkpoints import load_pretrained

    tm = _torch_model(in_ch=3, classes=15, seed=42)
    pth = tmp_path / "FLAIR-INC_rgb_15cl_resnet34-unet_weights.pth"
    torch.save(tm.state_dict(), pth)

    fm = FlairSegmentationModel(encoder_name="resnet34", classes=15,
                                dtype=jnp.float32)
    params, stats = init_model(fm, (1, 512, 512, 3))
    variables = load_pretrained(str(pth), {"params": params,
                                           "batch_stats": stats}, strict=True)

    x = rng.standard_normal((1, 512, 512, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)
    assert got.shape == want.shape == (1, 15, 512, 512)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("size,margin", [(64, 16), (64, 8), (32, 8), (64, 1)])
def test_inner_margin_decode_bit_identical(size, margin, rng):
    """The inner-crop decode fast path (plan_inner_crops) must be BIT-identical
    to full decoding + crop — it is the zone exact-clipping hot path."""
    from flairtpu.models.factory import init_model

    fm = FlairSegmentationModel(encoder_name="resnet34", classes=5,
                                dtype=jnp.float32)
    params, stats = init_model(fm, (1, size, size, 5), seed=11)
    x = jnp.asarray(rng.standard_normal((2, size, size, 5), dtype=np.float32))
    variables = {"params": params, "batch_stats": stats}
    full = fm.apply(variables, x, train=False)
    want = np.asarray(full[:, margin:size - margin, margin:size - margin, :])
    got = np.asarray(fm.apply(variables, x, train=False, inner_margin=margin))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


# pan hardcodes output-stride 16 and needs a stride-16 map >= 8px for its
# FPA pyramid, hence the larger tile
@pytest.mark.parametrize("arch,size,margin", [
    ("deeplabv3plus", 64, 16), ("fpn", 64, 16), ("pspnet", 64, 16),
    ("deeplabv3", 64, 16), ("pan", 128, 32)])
def test_inner_margin_strided_head_matches_full_crop(arch, size, margin, rng):
    """The strided-head inner decode (windowed align-corners head upsample,
    factory.decode) vs full decoding + crop — the zone exact-clipping hot
    path for the non-unet smp archs. The windowed einsum computes the same
    dot products but XLA may tile the smaller matmul differently, so the
    contract is reduction-order rounding (~1 ulp), argmax-exact."""
    from flairtpu.models.factory import init_model

    fm = FlairSegmentationModel(encoder_name="resnet18", arch=arch, classes=5,
                                dtype=jnp.float32)
    params, stats = init_model(fm, (1, size, size, 5), seed=11)
    x = jnp.asarray(rng.standard_normal((2, size, size, 5), dtype=np.float32))
    variables = {"params": params, "batch_stats": stats}
    full = fm.apply(variables, x, train=False)
    want = np.asarray(full[:, margin:size - margin, margin:size - margin, :])
    got = np.asarray(fm.apply(variables, x, train=False, inner_margin=margin))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_s2d_stem_numerically_equivalent(rng):
    """StemConv s2d=True (space-to-depth repack) must reproduce the 7x7/s2
    stem: same parameter tree, same logits (an execution-strategy knob for
    TPU MXU tiling, benchmarks/stem_s2d.py)."""
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "resnet34_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m0 = create_model(cfg)
    m1 = create_model(dict(cfg, s2d_stem=True))
    params, stats = init_model(m0, (1, 64, 64, 3))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    a = m0.apply({"params": params, "batch_stats": stats}, x, train=False)
    b = m1.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)
