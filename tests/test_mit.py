"""mit_b* smp encoder: mirror grounded against installed transformers,
Flax vs torch-mirror parity, converter structure, registry rules, factory.

Two-level oracle: (1) the torch mirror's backbone features are asserted
equal to transformers' SegformerModel (the installed real library — both
derive from NVlabs' code) via key-rename, so the mirror cannot silently
deviate from the true smp encoder; (2) the Flax port is parity-tested
against that grounded mirror through full encoder+decoder+head stacks.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from flairtpu.models import convert
from flairtpu.models.factory import FlairSegmentationModel, create_model, init_model
from flairtpu.models.registry import check_smp
from tests import torch_ref_mit as tmt


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def _hf_key(k: str) -> list[tuple[str, slice | None]]:
    """smp mix_transformer key -> [(SegformerModel key, row slice)]."""
    import re
    m = re.match(r"patch_embed(\d)\.(proj|norm)\.(weight|bias)", k)
    if m:
        s, sub, leaf = m.groups()
        hf_sub = "proj" if sub == "proj" else "layer_norm"
        return [(f"encoder.patch_embeddings.{int(s)-1}.{hf_sub}.{leaf}", None)]
    m = re.match(r"norm(\d)\.(weight|bias)", k)
    if m:
        s, leaf = m.groups()
        return [(f"encoder.layer_norm.{int(s)-1}.{leaf}", None)]
    m = re.match(r"block(\d)\.(\d+)\.(.+)", k)
    if m:
        s, j, rest = m.groups()
        base = f"encoder.block.{int(s)-1}.{j}"
        sub, leaf = rest.rsplit(".", 1)
        single = {
            "norm1": "layer_norm_1", "norm2": "layer_norm_2",
            "attn.q": "attention.self.query",
            "attn.proj": "attention.output.dense",
            "attn.sr": "attention.self.sr",
            "attn.norm": "attention.self.layer_norm",
            "mlp.fc1": "mlp.dense1", "mlp.dwconv.dwconv": "mlp.dwconv.dwconv",
            "mlp.fc2": "mlp.dense2",
        }
        if sub == "attn.kv":
            return [(f"{base}.attention.self.key.{leaf}", slice(0, None, 2)),
                    (f"{base}.attention.self.value.{leaf}", slice(1, None, 2))]
        return [(f"{base}.{single[sub]}.{leaf}", None)]
    raise KeyError(k)


def test_mirror_matches_installed_transformers(rng):
    """The hand mirror's features == SegformerModel's hidden states when
    loaded with the same weights (key-rename + kv split)."""
    from transformers import SegformerConfig, SegformerModel

    torch.manual_seed(0)
    mirror = tmt.MiTEncoderTorch("mit_b0").eval()

    cfg = SegformerConfig(
        num_channels=3, hidden_sizes=[32, 64, 160, 256],
        depths=[2, 2, 2, 2], num_attention_heads=[1, 2, 5, 8],
        sr_ratios=[8, 4, 2, 1], hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0)
    hf = SegformerModel(cfg).eval()

    hf_sd = dict(hf.state_dict())
    for k, v in mirror.state_dict().items():
        for hk, rows in _hf_key(k):
            if rows is None:
                hf_sd[hk] = v
            else:  # kv fused rows: first half -> key, second half -> value
                C = v.shape[0] // 2
                hf_sd[hk] = v[:C] if rows.start == 0 else v[C:]
    hf.load_state_dict(hf_sd)

    x = torch.from_numpy(rng.standard_normal((2, 3, 64, 64),
                                             dtype=np.float32))
    with torch.no_grad():
        want = hf(x, output_hidden_states=True).hidden_states
        got = mirror(x)[2:]  # drop identity + dummy
    assert len(want) == len(got) == 4
    for w, g in zip(want, got):
        # float32 accumulation-order noise only (oneDNN vs aten orderings
        # through 8 blocks of LN/attention); structural mismatches are
        # orders of magnitude larger
        np.testing.assert_allclose(g.numpy(), w.numpy(), atol=5e-4, rtol=2e-3)


CASES = {
    "mit_b0_unet": (lambda: tmt.MiTUnet("mit_b0", classes=6), "unet", 64),
    "mit_b0_fpn": (lambda: tmt.MiTFPN("mit_b0", classes=6), "fpn", 64),
    "mit_b0_manet": (lambda: tmt.MiTMAnet("mit_b0", classes=6), "manet", 64),
    "mit_b0_pspnet": (lambda: tmt.MiTPSPNet("mit_b0", classes=6), "pspnet", 64),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    builder, arch, size = CASES[request.param]
    torch.manual_seed(11)
    tm = _randomize_bn(builder())
    return arch, size, tm


def test_logit_parity(case, rng):
    arch, size, tm = case
    x = rng.standard_normal((2, size, size, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="mit_b0", arch=arch, classes=6,
                                dtype=jnp.float32)
    got = fm.apply(variables, jnp.asarray(x), train=False)
    got = np.moveaxis(np.asarray(got), -1, 1)

    assert got.shape == want.shape == (2, 6, size, size)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_converter_structure(case):
    arch, size, tm = case
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert.torch_to_flax(convert.normalize_keys(sd))
    fm = FlairSegmentationModel(encoder_name="mit_b0", arch=arch, classes=6)
    params, stats = init_model(fm, (1, size, size, 3))
    problems = convert.validate_against(
        variables, {"params": params, "batch_stats": stats}, strict=False)
    assert problems == []


@pytest.mark.parametrize("encoder_decoder,match", [
    ("mit_b0_deeplabv3", "dilated"), ("mit_b0_deeplabv3plus", "dilated"),
    ("mit_b0_pan", "dilated"), ("mit_b0_linknet", "zero-channel"),
    ("mit_b0_unetplusplus", "zero-channel")])
def test_incompatible_archs_rejected(encoder_decoder, match):
    with pytest.raises(ValueError, match=match):
        check_smp(encoder_decoder)


def test_in_channels_must_be_3():
    """smp MixVisionTransformerEncoder.set_in_channels parity: 5-channel
    FLAIR configs are rejected at config/factory time."""
    with pytest.raises(ValueError, match="in_channels"):
        check_smp("mit_b2_unet", n_channels=5)
    check_smp("mit_b2_unet", n_channels=3)  # RGB selection is fine


def test_factory_dispatch_and_forward():
    cfg = {"model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "mit_b0_unet"}},
        "n_classes": 5, "channels": [1, 2, 3]}
    m = create_model(cfg)
    params, stats = init_model(m, (1, 64, 64, 3))
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 5)
