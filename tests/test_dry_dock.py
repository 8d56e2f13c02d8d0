"""Real-weights dry dock (round-2 verdict #9, BASELINE.md accuracy anchor).

Every smp architecture (and one HF family) round-trips a FLAIR-INC-style
``.pth`` file through the PRODUCTION checkpoint path —
train/checkpoints.load_pretrained with strict validation — and reproduces
the torch mirror's logits. The day real published weights
(FLAIR-INC_*_weights.pth, configs/flair-1-config-detect.yaml:13) appear,
nothing in the loader/converter chain is unproven.

The per-arch parity tests (test_smp_extra, test_manet_pan, ...) cover
convert.torch_to_flax directly; this file covers the file-on-disk ->
factory-built-model strict-load route the CLIs actually take.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models.factory import FlairSegmentationModel, init_model
from flairtpu.train.checkpoints import load_pretrained
from tests import torch_ref

# arch -> (mirror class, input size); pan needs >=128 (FPA pyramid)
ARCHS = {
    "unet": (torch_ref.ResNet34Unet, 64),
    "unetplusplus": (torch_ref.ResNet34UnetPlusPlus, 64),
    "manet": (torch_ref.ResNet34MAnet, 64),
    "linknet": (torch_ref.ResNet34Linknet, 64),
    "fpn": (torch_ref.ResNet34FPN, 64),
    "pspnet": (torch_ref.ResNet34PSPNet, 64),
    "deeplabv3": (torch_ref.ResNet34DeepLabV3, 64),
    "deeplabv3plus": (torch_ref.ResNet34DeepLabV3Plus, 64),
    "pan": (torch_ref.ResNet34PAN, 128),
}


@pytest.mark.parametrize("arch", sorted(ARCHS))
def test_flair_inc_shaped_pth_loads_strict_every_arch(arch, tmp_path, rng):
    cls, size = ARCHS[arch]
    torch.manual_seed(3)
    tm = cls(in_channels=3, classes=15)
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.3, 0.3)
                mod.running_var.uniform_(0.7, 1.3)
    tm.eval()
    pth = tmp_path / f"FLAIR-INC_rgb_15cl_resnet34-{arch}_weights.pth"
    torch.save(tm.state_dict(), pth)

    fm = FlairSegmentationModel(encoder_name="resnet34", arch=arch, classes=15,
                                dtype=jnp.float32)
    params, stats = init_model(fm, (1, size, size, 3))
    variables = load_pretrained(str(pth), {"params": params,
                                           "batch_stats": stats}, strict=True)

    x = rng.standard_normal((1, size, size, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    got = np.moveaxis(np.asarray(fm.apply(variables, jnp.asarray(x),
                                          train=False)), -1, 1)
    assert got.shape == want.shape == (1, 15, size, size)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("encoder", ["efficientnet-b0", "mobilenet_v2",
                                     "vgg16_bn", "densenet121", "xception",
                                     "dpn68", "inceptionv4",
                                     "inceptionresnetv2",
                                     "timm-efficientnet-b0",
                                     "timm-resnest14d",
                                     "timm-gernet_s", "mobileone_s0"])
def test_nonresnet_encoder_pth_loads_strict(encoder, tmp_path, rng):
    """The non-resnet smp encoder families through the same file-on-disk ->
    load_pretrained strict route (unet decoder)."""
    from tests import torch_ref_dpn as tdp
    from tests import torch_ref_gernet as tgn
    from tests import torch_ref_mobileone as tmn
    from tests import torch_ref_inception as tin
    from tests import torch_ref_resnest as trn
    from tests import torch_ref_timm_en as ttn
    from tests import torch_ref_efficientnet as ten
    from tests import torch_ref_ptm as tpm
    from tests import torch_ref_tv as ttv

    builders = {
        "efficientnet-b0": lambda: ten.EfficientNetUnet(
            "efficientnet-b0", in_channels=3, classes=15),
        "mobilenet_v2": lambda: ttv.MobileNetV2Unet(in_channels=3, classes=15),
        "vgg16_bn": lambda: ttv.VGGUnet("vgg16_bn", in_channels=3, classes=15),
        "densenet121": lambda: ttv.DenseNetUnet("densenet121", in_channels=3,
                                                classes=15),
        "xception": lambda: tpm.XceptionUnet(in_channels=3, classes=15),
        "dpn68": lambda: tdp.DPNUnet("dpn68", in_channels=3, classes=15),
        "inceptionv4": lambda: tin.InceptionUnet("inceptionv4",
                                                 in_channels=3, classes=15),
        "inceptionresnetv2": lambda: tin.InceptionUnet(
            "inceptionresnetv2", in_channels=3, classes=15),
        "timm-efficientnet-b0": lambda: ttn.TimmENUnet(
            "timm-efficientnet-b0", in_channels=3, classes=15),
        "timm-resnest14d": lambda: trn.ResNestUnet(
            "timm-resnest14d", in_channels=3, classes=15),
        "timm-gernet_s": lambda: tgn.GERNetUnet("timm-gernet_s",
                                                in_channels=3, classes=15),
        "mobileone_s0": lambda: tmn.MobileOneUnet("mobileone_s0",
                                                  in_channels=3, classes=15),
    }
    torch.manual_seed(3)
    tm = builders[encoder]()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.3, 0.3)
                mod.running_var.uniform_(0.7, 1.3)
    tm.eval()
    pth = tmp_path / f"FLAIR-INC_rgb_15cl_{encoder}-unet_weights.pth"
    torch.save(tm.state_dict(), pth)

    fm = FlairSegmentationModel(encoder_name=encoder, arch="unet", classes=15,
                                dtype=jnp.float32)
    params, stats = init_model(fm, (1, 64, 64, 3))
    variables = load_pretrained(str(pth), {"params": params,
                                           "batch_stats": stats}, strict=True)

    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    got = np.moveaxis(np.asarray(fm.apply(variables, jnp.asarray(x),
                                          train=False)), -1, 1)
    assert got.shape == want.shape == (1, 15, 64, 64)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_hf_pth_loads_strict_production_path(tmp_path, rng):
    """One HF family (SegFormer-b0) through the same load_pretrained route."""
    from transformers import SegformerConfig, SegformerForSemanticSegmentation

    from flairtpu.models.segformer import SegformerModel

    torch.manual_seed(3)
    cfg = SegformerConfig(num_channels=5, num_labels=15)
    tm = SegformerForSemanticSegmentation(cfg).eval()
    pth = tmp_path / "segformer_b0_15cl.pth"
    torch.save(tm.state_dict(), pth)

    fm = SegformerModel(spec="b0", classes=15)
    params, stats = init_model(fm, (1, 64, 64, 5))
    variables = load_pretrained(str(pth), {"params": params,
                                           "batch_stats": stats}, strict=True)
    x = rng.standard_normal((1, 64, 64, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).logits.numpy()
    got = fm.apply(variables, jnp.asarray(x), train=False)
    # our port upsamples logits to input res (documented deviation)
    want_up = torch.nn.functional.interpolate(
        torch.from_numpy(want), size=(64, 64), mode="bilinear",
        align_corners=False).numpy()
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want_up,
                               atol=5e-4, rtol=1e-3)
