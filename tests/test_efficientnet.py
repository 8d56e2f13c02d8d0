"""EfficientNet encoder family: Flax vs torch-mirror parity + factory e2e.

Covers the modes the smp surface exercises: full-stride (unet/fpn), depth-3
(pspnet), dilated output-stride 16 (deeplabv3plus, pan), plus the
odd-image-trajectory static padding of b3/b5 and the b4 width/depth scaling.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.efficientnet import efficientnet_plan, round_filters
from flairtpu.models.factory import FlairSegmentationModel, create_model, init_model
from tests import torch_ref_efficientnet as ten


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


CASES = {
    # id -> (mirror cls, encoder, arch, input size)
    "b0_unet": (ten.EfficientNetUnet, "efficientnet-b0", "unet", 64),
    "b3_unet": (ten.EfficientNetUnet, "efficientnet-b3", "unet", 64),
    "b4_fpn": (ten.EfficientNetFPN, "efficientnet-b4", "fpn", 64),
    "b0_pspnet": (ten.EfficientNetPSPNet, "efficientnet-b0", "pspnet", 64),
    "b0_deeplabv3plus": (ten.EfficientNetDeepLabV3Plus, "efficientnet-b0",
                         "deeplabv3plus", 64),
    "b1_pan": (ten.EfficientNetPAN, "efficientnet-b1", "pan", 128),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    cls, enc, arch, size = CASES[request.param]
    torch.manual_seed(5)
    tm = _randomize_bn(cls(name=enc, in_channels=5, classes=6))
    return enc, arch, size, tm


def test_logit_parity(case, rng):
    enc, arch, size, tm = case
    x = rng.standard_normal((2, size, size, 5), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name=enc, arch=arch, classes=6,
                                dtype=jnp.float32)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (2, 6, size, size)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_converter_structure(case):
    enc, arch, size, tm = case
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name=enc, arch=arch, classes=6)
    params, stats = init_model(fm, (1, size, size, 5))
    problems = convert.validate_against(
        variables, {"params": params, "batch_stats": stats}, strict=False)
    assert problems == []


def test_plan_matches_smp_out_channels():
    """Channel plan reproduces smp's published out_channels table exactly."""
    smp_table = {
        "efficientnet-b0": (32, 24, 40, 112, 320),
        "efficientnet-b1": (32, 24, 40, 112, 320),
        "efficientnet-b2": (32, 24, 48, 120, 352),
        "efficientnet-b3": (40, 32, 48, 136, 384),
        "efficientnet-b4": (48, 32, 56, 160, 448),
        "efficientnet-b5": (48, 40, 64, 176, 512),
        "efficientnet-b6": (56, 40, 72, 200, 576),
        "efficientnet-b7": (64, 48, 80, 224, 640),
    }
    for name, want in smp_table.items():
        plan = efficientnet_plan(name)
        assert (plan["stem_ch"],) + plan["out_channels"][1:] == want, name
        assert plan["out_channels"] == want, name


def test_plan_matches_smp_stage_idxs():
    """Feature-tap indices reproduce smp's published stage_idxs (b1..b7 are
    documented; all sit at scaled-stage boundaries)."""
    smp_idxs = {
        "efficientnet-b1": (5, 8, 16), "efficientnet-b2": (5, 8, 16),
        "efficientnet-b3": (5, 8, 18), "efficientnet-b4": (6, 10, 22),
        "efficientnet-b5": (8, 13, 27), "efficientnet-b6": (9, 15, 31),
        "efficientnet-b7": (11, 18, 38),
    }
    for name, want in smp_idxs.items():
        assert efficientnet_plan(name)["stage_idxs"] == want, name


def test_factory_dispatch_and_forward():
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "efficientnet-b0_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    assert m.encoder_name == "efficientnet-b0" and m.arch == "unet"
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)


def test_efficientnet_train_step(rng):
    """efficientnet-b0_unet trains through the jitted step (drop-connect
    needs the dropout rng)."""
    import jax

    from flairtpu.train.loop import SegmentationTrainer

    config = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "efficientnet-b0_unet"},
        },
        "use_metadata": False, "use_augmentation": True, "use_weights": True,
        "channels": [1, 2, 3], "norm_type": "scaling",
        "norm_means": [], "norm_stds": [],
        "classes": {i: [1, f"c{i}"] for i in range(1, 5)},
        "batch_size": 2, "learning_rate": 0.01, "seed": 0,
    }
    t = SegmentationTrainer(config)
    step = t.train_step()
    batch = {"img": rng.integers(0, 255, size=(2, 64, 64, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(2, 64, 64)).astype(np.int32)}
    img, msk, mtd = t._put(batch)
    p, s, o, loss, cm, _ = step(t.params, t.batch_stats, t.opt_state,
                                img, msk, mtd, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert np.asarray(cm).sum() == 2 * 64 * 64
