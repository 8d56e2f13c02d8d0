"""FSDP / tensor-parallel parameter sharding (flairtpu/parallel/sharding.py).

The reference's only layout is DDP-replicated (src/flair/tasks.py:83-93);
fsdp/tensor are TPU-native extensions. Exactness bar: one train step from
identical init on the identical global batch must produce the same loss in
every layout (sharding changes reduction order only — BatchNorm in train
mode amplifies that noise through deep stacks, so comparisons stay
single-step; see test_remat_accum.py for the measured rationale).
"""

import copy

import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from flairtpu.parallel.mesh import make_mesh
from flairtpu.parallel.sharding import (
    leaf_spec, shard_tree, sharded_bytes, tree_specs)
from flairtpu.train.loop import SegmentationTrainer


def _config(**kw):
    cfg = {
        "model_framework": {
            "model_provider": "SegmentationModelsPytorch",
            "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"},
        },
        "use_metadata": False, "use_augmentation": False, "use_weights": True,
        "channels": [1, 2, 3],
        "norm_type": "scaling", "norm_means": [], "norm_stds": [],
        "classes": {i: [1, f"c{i}"] for i in range(1, 5)},
        "batch_size": 8, "learning_rate": 0.01, "seed": 0,
    }
    cfg.update(kw)
    return cfg


def _one_step(trainer, batch):
    trainer.shard_to_mesh()
    step = trainer.train_step()
    img, msk, mtd = trainer._put(batch)
    params, stats, opt, loss, cm, _ = step(
        copy.deepcopy(trainer.params), copy.deepcopy(trainer.batch_stats),
        copy.deepcopy(trainer.opt_state), img, msk, mtd, jax.random.PRNGKey(7))
    return params, opt, float(loss), np.asarray(cm)


# ---------------------------------------------------------------- spec rule

def test_leaf_spec_prefers_last_largest_divisible_dim():
    # HWIO conv kernel: O sharded (Megatron column-parallel convention)
    assert leaf_spec((3, 3, 64, 64), 8, "model") == P(None, None, None, "model")
    # (in, out) dense kernel with only out divisible
    assert leaf_spec((45, 64), 8, "model", min_elems=1) == P(None, "model")
    # largest divisible dim wins even when not last
    assert leaf_spec((256, 3, 64), 8, "model", min_elems=1) == P("model", None, None)


def test_leaf_spec_replicates_small_and_indivisible():
    assert leaf_spec((512,), 8, "data") == P()          # below min_elems
    assert leaf_spec((3, 3, 5, 66), 8, "data", min_elems=1) == P()  # indivisible
    assert leaf_spec((), 8, "data") == P()              # scalar
    assert leaf_spec((2 ** 16,), 1, "data") == P()      # 1-way mesh axis


def test_tree_specs_shape_rule_is_uniform_across_state_trees(rng):
    """Momentum mirrors param shapes -> identical specs leaf-for-leaf."""
    mesh = make_mesh()
    params = {"w": np.zeros((3, 3, 64, 64), np.float32),
              "b": np.zeros((64,), np.float32)}
    momentum = jax.tree_util.tree_map(np.copy, params)
    sp, sm = tree_specs(params, mesh, "data"), tree_specs(momentum, mesh, "data")
    assert sp == sm
    assert sp["w"] == P(None, None, None, "data") and sp["b"] == P()


def test_shard_tree_places_and_counts_bytes():
    mesh = make_mesh()
    tree = {"big": np.ones((8, 4096), np.float32),
            "small": np.ones((16,), np.float32)}
    sharded = shard_tree(tree, mesh, "data")
    assert sharded["big"].sharding.spec == P(None, "data")  # largest dim wins
    assert sharded["big"].addressable_shards[0].data.shape == (8, 512)
    assert sharded["small"].sharding.spec == P()
    total, per_dev = sharded_bytes(sharded)
    assert total == 8 * 4096 * 4 + 16 * 4
    assert per_dev == 8 * 512 * 4 + 16 * 4  # 1/8 of big + all of small


# ------------------------------------------------------- one-step exactness

def test_fsdp_and_tensor_match_replicated_one_step(rng):
    batch = {"img": rng.integers(0, 255, size=(8, 32, 32, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(8, 32, 32)).astype(np.int32)}

    ref = SegmentationTrainer(_config(), mesh=make_mesh())
    _, _, loss_ref, cm_ref = _one_step(ref, batch)

    fsdp = SegmentationTrainer(_config(param_sharding="fsdp"), mesh=make_mesh())
    p_fsdp, o_fsdp, loss_fsdp, cm_fsdp = _one_step(fsdp, batch)

    tmesh = make_mesh(("data", "model"), shape=(4, 2))
    tp = SegmentationTrainer(
        _config(param_sharding="tensor", tensor_parallel=2), mesh=tmesh)
    p_tp, o_tp, loss_tp, cm_tp = _one_step(tp, batch)

    assert loss_fsdp == pytest.approx(loss_ref, rel=1e-4)
    assert loss_tp == pytest.approx(loss_ref, rel=1e-4)
    np.testing.assert_array_equal(cm_fsdp, cm_ref)
    np.testing.assert_array_equal(cm_tp, cm_ref)

    # the updated state keeps the sharded layout (donation-clean)
    big = [l for l in jax.tree_util.tree_leaves(p_fsdp) if l.size >= 2 ** 13]
    n_sharded = sum(1 for l in big if "data" in jax.tree_util.tree_leaves(
        list(l.sharding.spec)))
    assert big and n_sharded >= 0.8 * len(big), (n_sharded, len(big))
    total, per_dev = sharded_bytes(p_fsdp)
    assert per_dev < 0.35 * total, (total, per_dev)  # ~1/8 + replicated tail
    # plain SGD (reference tasks_utils.py:95) is stateless — nothing
    # param-sized to shard; the shape rule would mirror momentum if present
    # (test_tree_specs_shape_rule_is_uniform_across_state_trees)
    assert sharded_bytes(o_fsdp)[0] < 1024

    total_tp, per_dev_tp = sharded_bytes(p_tp)
    assert per_dev_tp < 0.75 * total_tp  # 2-way model axis

    # eval (train=False, running BN stats) under sharded params: same loss
    eval_losses = []
    for t in (ref, fsdp, tp):
        img, msk, mtd = t._put(batch)
        loss, cm = t.eval_step()(t.params, t.batch_stats, img, msk, mtd)
        eval_losses.append(float(loss))
        assert np.asarray(cm).sum() == batch["msk"].size
    assert eval_losses[1] == pytest.approx(eval_losses[0], rel=1e-5)
    assert eval_losses[2] == pytest.approx(eval_losses[0], rel=1e-5)


def test_fsdp_second_step_reuses_compiled_donated_buffers(rng):
    batch = {"img": rng.integers(0, 255, size=(8, 32, 32, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(8, 32, 32)).astype(np.int32)}
    t = SegmentationTrainer(_config(param_sharding="fsdp"), mesh=make_mesh())
    t.shard_to_mesh()
    step = t.train_step()
    img, msk, mtd = t._put(batch)
    rng_dev = jax.random.PRNGKey(0)
    params, stats, opt = t.params, t.batch_stats, t.opt_state
    for _ in range(2):  # step 2 feeds step-1 outputs back (layout round trip)
        params, stats, opt, loss, cm, rng_dev = step(
            params, stats, opt, img, msk, mtd, rng_dev)
    assert np.isfinite(float(loss))
    assert cm.sum() == batch["msk"].size


def test_loss_invariant_across_device_counts(rng):
    """SURVEY §7 hard part 5: same seed + same global batch -> same step
    numerics whatever the device count (the rng splits per step, not per
    device, and augmentation keys derive per-sample)."""
    batch = {"img": rng.integers(0, 255, size=(8, 32, 32, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(8, 32, 32)).astype(np.int32)}
    cfg = _config(use_augmentation=True)
    losses, cms = [], []
    for ndev in (8, 2, 1):
        t = SegmentationTrainer(
            cfg, mesh=make_mesh(devices=jax.devices()[:ndev]))
        _, _, loss, cm = _one_step(t, batch)
        losses.append(loss)
        cms.append(cm)
    assert losses[1] == pytest.approx(losses[0], rel=1e-4)
    assert losses[2] == pytest.approx(losses[0], rel=1e-4)
    np.testing.assert_array_equal(cms[1], cms[0])
    np.testing.assert_array_equal(cms[2], cms[0])


# --------------------------------------------------------- spatial parallel

def test_spatial_matches_replicated_one_step(rng):
    """H-sharded activations (XLA conv halo exchange) = replicated numerics.

    The vision analog of sequence parallelism: batch over 'data', image
    height over 'space' (flairtpu/parallel/mesh.py batch_sharding). Params
    stay replicated; only reduction order may differ.
    """
    batch = {"img": rng.integers(0, 255, size=(8, 32, 32, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(8, 32, 32)).astype(np.int32)}

    ref = SegmentationTrainer(_config(), mesh=make_mesh())
    _, _, loss_ref, cm_ref = _one_step(ref, batch)

    smesh = make_mesh(("data", "space"), shape=(4, 2))
    sp = SegmentationTrainer(
        _config(spatial_parallel=2), mesh=smesh)
    img, msk, mtd = sp._put(batch)
    # the input really is height-sharded: each shard holds H/2 rows
    assert img.sharding.spec == P("data", "space", None, None)
    assert img.addressable_shards[0].data.shape == (2, 16, 32, 3)
    assert msk.sharding.spec == P("data", "space", None)
    _, _, loss_sp, cm_sp = _one_step(sp, batch)

    assert loss_sp == pytest.approx(loss_ref, rel=1e-4)
    np.testing.assert_array_equal(cm_sp, cm_ref)

    # composes with fsdp (params shard over 'data', activations over 'space')
    fs = SegmentationTrainer(
        _config(spatial_parallel=2, param_sharding="fsdp"),
        mesh=make_mesh(("data", "space"), shape=(4, 2)))
    p_fs, _, loss_fs, cm_fs = _one_step(fs, batch)
    assert loss_fs == pytest.approx(loss_ref, rel=1e-4)
    np.testing.assert_array_equal(cm_fs, cm_ref)
    total, per_dev = sharded_bytes(p_fs)
    assert per_dev < 0.5 * total


def test_spatial_eval_and_predict_steps(rng):
    batch = {"img": rng.integers(0, 255, size=(8, 32, 32, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(8, 32, 32)).astype(np.int32)}
    ref = SegmentationTrainer(_config(), mesh=make_mesh())
    sp = SegmentationTrainer(
        _config(spatial_parallel=2),
        mesh=make_mesh(("data", "space"), shape=(4, 2)))
    outs = []
    for t in (ref, sp):
        t.shard_to_mesh()
        img, msk, mtd = t._put(batch)
        loss, cm = t.eval_step()(t.params, t.batch_stats, img, msk, mtd)
        pred = t.predict_step()(t.params, t.batch_stats, img, mtd)
        outs.append((float(loss), np.asarray(cm), np.asarray(pred)))
    assert outs[1][0] == pytest.approx(outs[0][0], rel=1e-5)
    np.testing.assert_array_equal(outs[1][1], outs[0][1])
    np.testing.assert_array_equal(outs[1][2], outs[0][2])


def test_spatial_rejects_indivisible_height(rng):
    sp = SegmentationTrainer(
        _config(spatial_parallel=2),
        mesh=make_mesh(("data", "space"), shape=(4, 2)))
    batch = {"img": rng.integers(0, 255, size=(8, 31, 32, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(8, 31, 32)).astype(np.int32)}
    with pytest.raises(ValueError, match="height 31"):
        sp._put(batch)


def test_trainer_autobuilds_2d_mesh_for_spatial():
    t = SegmentationTrainer(_config(spatial_parallel=2))
    assert t.mesh.axis_names == ("data", "space")
    assert t.mesh.shape["space"] == 2 and t.mesh.shape["data"] == 4

    with pytest.raises(ValueError, match="space"):
        SegmentationTrainer(
            _config(spatial_parallel=2), mesh=make_mesh())
    with pytest.raises(ValueError, match="tensor"):
        SegmentationTrainer(
            _config(param_sharding="tensor", tensor_parallel=2,
                    spatial_parallel=2))


# ------------------------------------------------------------- config knobs

def test_config_validates_param_sharding():
    from flairtpu.config import ConfigError, validate_train_config

    def base(**kw):
        cfg = _config(**kw)
        cfg["paths"], cfg["tasks"] = {}, {}
        return cfg

    assert validate_train_config(base())["param_sharding"] == "replicated"
    assert validate_train_config(base())["spatial_parallel"] == 1
    assert validate_train_config(
        base(spatial_parallel=4))["spatial_parallel"] == 4
    with pytest.raises(ConfigError, match="spatial_parallel"):
        validate_train_config(base(spatial_parallel=0))
    with pytest.raises(ConfigError, match="spatial_parallel"):
        validate_train_config(base(
            param_sharding="tensor", tensor_parallel=2, spatial_parallel=2))
    assert validate_train_config(
        base(param_sharding="fsdp"))["tensor_parallel"] == 1
    with pytest.raises(ConfigError, match="param_sharding"):
        validate_train_config(base(param_sharding="zero3"))
    with pytest.raises(ConfigError, match="tensor_parallel"):
        validate_train_config(base(param_sharding="tensor"))
    validate_train_config(base(param_sharding="tensor", tensor_parallel=2))


def test_trainer_autobuilds_2d_mesh_for_tensor_mode():
    t = SegmentationTrainer(_config(param_sharding="tensor", tensor_parallel=2))
    assert t.mesh.axis_names == ("data", "model")
    assert t.mesh.shape["model"] == 2 and t.mesh.shape["data"] == 4

    with pytest.raises(ValueError, match="model"):
        SegmentationTrainer(
            _config(param_sharding="tensor", tensor_parallel=2),
            mesh=make_mesh())  # 1-D mesh lacks the model axis
    with pytest.raises(ValueError, match="does not match"):
        SegmentationTrainer(  # configured degree != mesh axis size
            _config(param_sharding="tensor", tensor_parallel=4),
            mesh=make_mesh(("data", "model"), shape=(4, 2)))
    with pytest.raises(ValueError, match="does not match"):
        SegmentationTrainer(
            _config(spatial_parallel=4),
            mesh=make_mesh(("data", "space"), shape=(4, 2)))
