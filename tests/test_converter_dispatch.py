"""any_state_dict_to_flax routing: every family's key signature must reach
its own converter (guards the dispatch ordering — BEiT/DPT/MobileViT all
carry decode_head./segmentation_head. keys that overlap other branches)."""

import numpy as np
import pytest

import flairtpu.models.convert as convert

# minimal key signatures per family (prefix presence is what dispatch reads)
SIGNATURES = {
    "smp_resnet_unet": ["encoder.conv1.weight", "decoder.blocks.0.conv1.0.weight",
                        "segmentation_head.0.weight"],
    "segformer": ["segformer.encoder.patch_embeddings.0.proj.weight",
                  "decode_head.classifier.weight"],
    "swin_upernet": ["backbone.encoder.layers.0.blocks.0.attention.self.query.weight",
                     "decode_head.classifier.weight"],
    "convnext_upernet": ["backbone.encoder.stages.0.layers.0.dwconv.weight",
                         "decode_head.classifier.weight"],
    "beit": ["beit.encoder.layer.0.attention.attention.query.weight",
             "decode_head.classifier.weight", "fpn1.0.weight"],
    "data2vec": ["data2vec_vision.encoder.layer.0.attention.attention.query.weight",
                 "decode_head.classifier.weight"],
    "dpt": ["dpt.encoder.layer.0.attention.attention.query.weight",
            "neck.convs.0.weight", "head.head.0.weight"],
    "mobilevit": ["mobilevit.conv_stem.convolution.weight",
                  "segmentation_head.aspp.convs.0.convolution.weight"],
    "mobilenet_v2": ["mobilenet_v2.conv_stem.first_conv.convolution.weight",
                     "segmentation_head.classifier.convolution.weight"],
}

EXPECTED = {
    "smp_resnet_unet": "torch_to_flax",
    "segformer": "segformer.hf_torch_to_flax",
    "swin_upernet": "swin_upernet.hf_upernet_torch_to_flax",
    "convnext_upernet": "convnext_upernet.hf_convnext_upernet_torch_to_flax",
    "beit": "beit_upernet.hf_beit_torch_to_flax",
    "data2vec": "beit_upernet.hf_beit_torch_to_flax",
    "dpt": "dpt.hf_dpt_torch_to_flax",
    "mobilevit": "mobilevit.hf_mobilevit_torch_to_flax",
    "mobilenet_v2": "mobilenet_v2.hf_mobilenet_v2_torch_to_flax",
}


@pytest.mark.parametrize("family", sorted(SIGNATURES))
def test_dispatch_routes_to_own_converter(family, monkeypatch):
    hits = []

    def spy(modname, fname):
        def fn(sd):
            hits.append(f"{modname}.{fname}" if modname else fname)
            return {"params": {}, "batch_stats": {}}
        return fn

    import flairtpu.models.beit_upernet as beit_mod
    import flairtpu.models.convnext_upernet as cn_mod
    import flairtpu.models.dpt as dpt_mod
    import flairtpu.models.mobilenet_v2 as mn_mod
    import flairtpu.models.mobilevit as mv_mod
    import flairtpu.models.segformer as sf_mod
    import flairtpu.models.swin_upernet as sw_mod

    monkeypatch.setattr(convert, "torch_to_flax", spy("", "torch_to_flax"))
    monkeypatch.setattr(sf_mod, "hf_torch_to_flax",
                        spy("segformer", "hf_torch_to_flax"))
    monkeypatch.setattr(sw_mod, "hf_upernet_torch_to_flax",
                        spy("swin_upernet", "hf_upernet_torch_to_flax"))
    monkeypatch.setattr(cn_mod, "hf_convnext_upernet_torch_to_flax",
                        spy("convnext_upernet", "hf_convnext_upernet_torch_to_flax"))
    monkeypatch.setattr(beit_mod, "hf_beit_torch_to_flax",
                        spy("beit_upernet", "hf_beit_torch_to_flax"))
    monkeypatch.setattr(dpt_mod, "hf_dpt_torch_to_flax",
                        spy("dpt", "hf_dpt_torch_to_flax"))
    monkeypatch.setattr(mv_mod, "hf_mobilevit_torch_to_flax",
                        spy("mobilevit", "hf_mobilevit_torch_to_flax"))
    monkeypatch.setattr(mn_mod, "hf_mobilenet_v2_torch_to_flax",
                        spy("mobilenet_v2", "hf_mobilenet_v2_torch_to_flax"))

    sd = {k: np.zeros(1, np.float32) for k in SIGNATURES[family]}
    convert.any_state_dict_to_flax(sd)
    assert hits == [EXPECTED[family]]
