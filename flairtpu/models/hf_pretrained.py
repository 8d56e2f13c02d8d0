"""Pretrained initialization for the HuggingFace provider.

The reference's HF path never trains from scratch: it always starts from a
pretrained segmentation checkpoint via
``AutoModelForSemanticSegmentation.from_pretrained(org_model,
config=AutoConfig.from_pretrained(org_model, num_labels=n_classes),
ignore_mismatched_sizes=True)`` (ref src/flair/model.py:43-50) — all weights
load except tensors whose shapes disagree with the configured model (the
classifier head when ``num_labels`` differs; the patch-embed/stem conv when
the channel count differs), which transformers leaves at their fresh random
init and reports in a "newly initialized" warning.

flairtpu has no model-zoo egress, so the checkpoint is a *local* transformers
artifact: a ``save_pretrained`` directory, or a bare
``model.safetensors``/``pytorch_model.bin`` weights file. The train config's
``init_hf_pretrained: <path>`` routes it through the existing per-family
``hf_*_torch_to_flax`` converters (:mod:`flairtpu.models.convert`
``any_state_dict_to_flax`` dispatch) and reproduces the
``ignore_mismatched_sizes=True`` merge:

1. every reference leaf whose converted counterpart exists with the same
   shape takes the checkpoint value;
2. shape-mismatched or missing leaves keep the model's fresh random init
   (transformers' behavior — NOT the zero-init of the smp-side
   ``init_weights_only_from_ckpt`` surgery, which mirrors
   ref flair/main.py:120-138 instead) and are reported;
3. converted leaves absent from the model are reported as unused;
4. a checkpoint that matches (almost) nothing is an error — it is the wrong
   family/size for the configured ``org_model``, mirroring the config-shape
   errors transformers raises before the weight merge.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np

# save_pretrained weight-file names, in transformers' own load order
# (safetensors is the modern default serialization)
_WEIGHT_FILE_CANDIDATES = ("model.safetensors", "pytorch_model.bin")


def resolve_hf_checkpoint(path: str | Path) -> Path:
    """Resolve a save_pretrained dir (or direct weights file) to the file."""
    p = Path(path)
    if p.is_dir():
        for name in _WEIGHT_FILE_CANDIDATES:
            if (p / name).exists():
                return p / name
        # sharded checkpoints (model-00001-of-000NN.safetensors) and any
        # stray single-file layout: fall back to globbing
        found = sorted(p.glob("*.safetensors")) or sorted(p.glob("*.bin"))
        if found:
            return found[0]
        raise FileNotFoundError(
            f"no transformers weights found in {p!r} (expected "
            f"{'/'.join(_WEIGHT_FILE_CANDIDATES)})")
    if not p.exists():
        raise FileNotFoundError(f"init_hf_pretrained file not found: {p!r}")
    return p


def load_hf_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Read a transformers weights file into {torch_key: np.ndarray}."""
    p = resolve_hf_checkpoint(path)
    if p.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(p)))
    from flairtpu.models.convert import load_torch_state_dict

    return load_torch_state_dict(p)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def init_hf_from_pretrained(path: str | Path, reference_variables: dict,
                            verbose: bool = True) -> tuple[dict, dict]:
    """Merge a local transformers checkpoint into fresh model variables.

    Returns ``(variables, report)`` where ``report`` has key-path lists
    ``loaded`` / ``reinitialized`` (shape mismatch or missing — kept at the
    model's fresh init, transformers' ``ignore_mismatched_sizes=True``
    semantics) / ``unused`` (checkpoint leaves the model has no slot for).
    """
    from flairtpu.models.convert import any_state_dict_to_flax

    sd = load_hf_state_dict(path)
    converted = any_state_dict_to_flax(sd)

    ref_flat = {
        coll: _flatten(reference_variables.get(coll, {}) or {})
        for coll in ("params", "batch_stats")
    }
    got_flat = {
        coll: _flatten(converted.get(coll, {}) or {})
        for coll in ("params", "batch_stats")
    }

    report = {"loaded": [], "reinitialized": [], "unused": []}
    out = {}
    for coll in ("params", "batch_stats"):
        merged = {}
        for key, ref_leaf in ref_flat[coll].items():
            got = got_flat[coll].get(key)
            name = coll + "/" + "/".join(key)
            if got is not None and tuple(np.shape(got)) == tuple(np.shape(ref_leaf)):
                merged[key] = np.asarray(got)
                report["loaded"].append(name)
            else:
                merged[key] = ref_leaf
                report["reinitialized"].append(name)
        for key in got_flat[coll]:
            if key not in ref_flat[coll]:
                report["unused"].append(coll + "/" + "/".join(key))
        tree: dict = {}
        for key, leaf in merged.items():
            node = tree
            for part in key[:-1]:
                node = node.setdefault(part, {})
            node[key[-1]] = leaf
        out[coll] = tree

    n_ref = sum(len(v) for v in ref_flat.values())
    if n_ref and len(report["loaded"]) < max(1, n_ref // 2):
        raise ValueError(
            f"checkpoint {str(path)!r} matches only {len(report['loaded'])} of "
            f"{n_ref} model tensors — it is not a checkpoint for the configured "
            "HuggingFace org_model (wrong family or size). transformers would "
            "reject the config mismatch the same way.")
    if verbose and (report["reinitialized"] or report["unused"]):
        if report["reinitialized"]:
            print("[hf init] kept at fresh random init (shape mismatch or "
                  "missing — ignore_mismatched_sizes semantics):")
            for s in report["reinitialized"]:
                print(f"    - {s}")
        if report["unused"]:
            print(f"[hf init] {len(report['unused'])} checkpoint tensors "
                  "unused by the model (e.g. a different-num_labels head)")
    return out, report
