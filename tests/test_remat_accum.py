"""Gradient accumulation + rematerialization (TPU memory knobs).

The reference reaches big effective batches through Lightning's
accumulate_grad_batches and torch checkpointing (tasks.py:83-93 Trainer
knobs); here `accumulate_steps` scans microbatches inside the jitted step
and `remat` wraps encoder/decoder blocks in jax.checkpoint.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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
        "batch_size": 4, "learning_rate": 0.01, "seed": 0,
    }
    cfg.update(kw)
    return cfg


def _run_step(trainer, batch):
    step = trainer.train_step()
    img, msk, mtd = trainer._put(batch)
    return step(trainer.params, trainer.batch_stats, trainer.opt_state,
                img, msk, mtd, jax.random.PRNGKey(0))


def test_accumulate_scan_matches_explicit_microbatch_loop(rng):
    """The accumulate_steps lax.scan must equal an explicit replay of the
    same microbatches through the same _micro_step: averaged grads -> one
    SGD update, chained BN stats, mean loss, summed confmat.

    (Two comparisons that do NOT work for BatchNorm models at random init,
    measured while building this test: a full-batch A=1 comparison — eval
    grads match bitwise across batch shapes but train-mode BN amplifies
    ~1e-7 reduction-order noise into O(1) grad differences through 20
    normalization layers — and a sharded-step-vs-unsharded-replay
    comparison, for the same reason. Hence the single-device mesh and the
    replay at identical shapes; residual scan-vs-direct compile noise
    measures ~5e-6 relative.)"""
    from flairtpu.data.normalize import normalize_device
    from flairtpu.parallel.mesh import make_mesh

    batch = {"img": rng.integers(0, 255, size=(4, 32, 32, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(4, 32, 32)).astype(np.int32)}
    t = SegmentationTrainer(_config(accumulate_steps=2),
                            mesh=make_mesh(devices=jax.devices()[:1]))
    # deep-copy: the jitted step donates params/stats buffers
    p0 = jax.tree_util.tree_map(jnp.array, t.params)
    s0 = jax.tree_util.tree_map(jnp.array, t.batch_stats)
    p2, s2, o2, loss2, cm2, _ = _run_step(t, batch)

    # explicit replay with identical keys/shapes
    img, msk, mtd = t._put(batch)
    _, aug_key, dropout_key = jax.random.split(jax.random.PRNGKey(0), 3)
    tgt = t._clean_targets(msk)
    x = normalize_device(img, src_dtype=np.uint8, norm_type="scaling",
                         means=(), stds=())
    keys = jax.random.split(dropout_key, 2)
    micro = jax.jit(t._micro_step)
    g0, s_a, l0, c0 = micro(p0, s0, x[:2], tgt[:2], mtd[:2], keys[0])
    g1, s_b, l1, c1 = micro(p0, s_a, x[2:], tgt[2:], mtd[2:], keys[1])
    del g0, g1, p2

    # Forward-level quantities (loss, confmat, BN running stats) are
    # well-conditioned and must agree tightly. Param/grad-level agreement is
    # deliberately NOT asserted on the real model: the gradients of a
    # random-init 20-BN-layer net are chaotic — measured grad deltas exceed
    # grad magnitudes for ~1e-7 compile-fusion input differences — so the
    # exact grad-averaging plumbing is locked by
    # test_accumulate_plumbing_exact below instead.
    np.testing.assert_allclose(float(loss2), (float(l0) + float(l1)) / 2,
                               rtol=1e-3)
    cm_want = np.asarray(c0) + np.asarray(c1)
    assert np.asarray(cm2).sum() == cm_want.sum() == 4 * 32 * 32
    assert np.abs(np.asarray(cm2) - cm_want).sum() <= 0.01 * cm_want.sum()
    # BN stats chain through the scan: final stats == second microbatch's.
    # Deep-layer activations inherit ~0.3% of the BN chaos (measured); an
    # unchained-stats bug would differ by the whole first momentum update
    # (~10x more)
    for a, b in zip(jax.tree_util.tree_leaves(s2),
                    jax.tree_util.tree_leaves(s_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=8e-3, rtol=8e-2)


def test_accumulate_plumbing_exact(rng):
    """Exact check of the accumulation plumbing with a deterministic fake
    _micro_step: grads averaged over microbatches (the 1/A), stats chained
    through the scan carry, loss = mean of microbatch losses, confmat
    summed, and exactly one optimizer update."""
    t = SegmentationTrainer(_config(accumulate_steps=2))
    lr = 0.01
    K = t.num_classes

    def fake_micro(params, stats, x, tgt, mtd, key):
        m = jnp.mean(x)
        grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, m), params)
        new_stats = jax.tree_util.tree_map(lambda s: s + 1.0, stats)
        return grads, new_stats, m, jnp.ones((K, K), jnp.int32)

    t._micro_step = fake_micro
    p0 = jax.tree_util.tree_map(jnp.array, t.params)
    s0 = jax.tree_util.tree_map(jnp.array, t.batch_stats)
    batch = {"img": rng.integers(0, 255, size=(4, 32, 32, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(4, 32, 32)).astype(np.int32)}
    p2, s2, o2, loss2, cm2, _ = _run_step(t, batch)

    from flairtpu.data.normalize import normalize_device

    x = normalize_device(jnp.asarray(batch["img"]), src_dtype=np.uint8,
                         norm_type="scaling", means=(), stds=())
    m1, m2 = float(jnp.mean(x[:2])), float(jnp.mean(x[2:]))
    g_mean = (m1 + m2) / 2
    np.testing.assert_allclose(float(loss2), g_mean, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(cm2), 2 * np.ones((K, K)))
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(p0)):
        # plain SGD: p_new = p0 - lr * averaged grad, exactly
        np.testing.assert_allclose(np.asarray(a), np.asarray(b) - lr * g_mean,
                                   atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s2),
                    jax.tree_util.tree_leaves(s0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b) + 2.0,
                                   atol=1e-7)


def test_accumulate_heterogeneous_batch_trains(rng):
    """accumulate_steps with distinct microbatches: finite loss, full confmat
    mass, params actually move."""
    batch = {"img": rng.integers(0, 255, size=(4, 32, 32, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(4, 32, 32)).astype(np.int32)}
    t = SegmentationTrainer(_config(accumulate_steps=4))
    before = jax.tree_util.tree_leaves(t.params)[0].copy()
    p, s, o, loss, cm, _ = _run_step(t, batch)
    assert np.isfinite(float(loss))
    assert np.asarray(cm).sum() == 4 * 32 * 32
    assert not np.allclose(np.asarray(jax.tree_util.tree_leaves(p)[0]),
                           np.asarray(before))


def test_accumulate_indivisible_batch_raises():
    with pytest.raises(ValueError, match="divisible"):
        SegmentationTrainer(_config(batch_size=3, accumulate_steps=2))


def test_remat_matches_plain_forward_and_grads(rng):
    """remat must not change numerics: same seed -> identical loss and
    updated params (recompute-on-backward only trades memory for FLOPs)."""
    batch = {"img": rng.integers(0, 255, size=(2, 32, 32, 3)).astype(np.uint8),
             "msk": rng.integers(0, 4, size=(2, 32, 32)).astype(np.int32)}
    cfg = _config(batch_size=2)
    t1 = SegmentationTrainer(cfg)
    p1, _, _, loss1, _, _ = _run_step(t1, batch)
    t2 = SegmentationTrainer(_config(batch_size=2, remat=True))
    p2, _, _, loss2, _, _ = _run_step(t2, batch)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_remat_beit_trains(rng):
    """BEiT with remat: the transformer layers wrap in nn.remat and a train
    step runs (tiny geometry on CPU; the memory win is a TPU measurement,
    benchmarks/remat_accum.py)."""
    from flairtpu.models.beit_upernet import BeitUperNet
    from flairtpu.models.factory import init_model

    model = BeitUperNet(spec="base", classes=4, hidden=32, layers=4, heads=2,
                        intermediate=64, out_indices=(2, 3, 4, 5), remat=True,
                        trained_window=2)
    params, stats = init_model(model, (1, 32, 32, 3))

    def loss_fn(p, x):
        out, _ = model.apply({"params": p, "batch_stats": stats}, x,
                             train=True, rngs={"dropout": jax.random.PRNGKey(0)},
                             mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    loss, grads = jax.value_and_grad(loss_fn)(params, x)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_remat_policy_matches_full_remat(rng):
    """Selective remat (jax.checkpoint_policies.dots_saveable) is a pure
    execution-strategy knob: identical loss and grads vs full remat, and the
    config plumbs the policy name to BeitUperNet (factory + validation)."""
    from flairtpu import config as cfgmod
    from flairtpu.models.beit_upernet import BeitUperNet
    from flairtpu.models.factory import create_model, init_model

    kw = dict(spec="base", classes=4, hidden=32, layers=4, heads=2,
              intermediate=64, out_indices=(2, 3, 4, 5), remat=True,
              trained_window=2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))

    results = []
    for policy in (None, "dots_saveable"):
        model = BeitUperNet(remat_policy=policy, **kw)
        params, stats = init_model(model, (1, 32, 32, 3), seed=11)

        def loss_fn(p):
            out, _ = model.apply({"params": p, "batch_stats": stats}, x,
                                 train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)},
                                 mutable=["batch_stats"])
            return jnp.mean(out ** 2)

        results.append(jax.value_and_grad(loss_fn)(params))
    (l1, g1), (l2, g2) = results
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)

    # config-side: the knob validates and reaches the model
    cfg = {"paths": {}, "tasks": {}, "model_framework": {
        "model_provider": "HuggingFace",
        "HuggingFace": {"org_model": "microsoft/beit-base-finetuned-ade-640-640"}},
        "channels": [1, 2, 3], "norm_type": "scaling",
        "classes": {i: [1, f"c{i}"] for i in range(1, 5)},
        "remat": True, "remat_policy": "dots_saveable"}
    cfgmod.validate_train_config(dict(cfg))
    m = create_model(cfg)
    assert m.remat and m.remat_policy == "dots_saveable"
    with pytest.raises(cfgmod.ConfigError, match="remat_policy"):
        cfgmod.validate_train_config(dict(cfg, remat_policy="frobnicate"))


def test_bn_dtype_bfloat16_trains(rng):
    """`bn_dtype: bfloat16` (config.py) routes BN stat math through bf16
    (measured +8% train step on the v5e — PERFORMANCE.md round-4 train MFU)
    while params/running stats stay fp32 and the step still learns."""
    from flairtpu import config as cfgmod
    from flairtpu.models.resnet import set_bn_dtype

    batch = {
        "img": rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8),
        "msk": rng.integers(0, 4, (4, 32, 32)).astype(np.int32),
    }
    try:
        t = SegmentationTrainer(_config(bn_dtype="bfloat16"))
        p, s, o, loss, cm, key = _run_step(t, batch)
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(s):
            assert leaf.dtype == jnp.float32  # running stats never downcast
        for leaf in jax.tree_util.tree_leaves(p):
            assert leaf.dtype == jnp.float32
        # fp32 reference from the same seed: bf16 stat math stays close
        set_bn_dtype("float32")
        t2 = SegmentationTrainer(_config())
        _, _, _, loss2, _, _ = _run_step(t2, batch)
        np.testing.assert_allclose(float(loss), float(loss2), rtol=0.05)
    finally:
        set_bn_dtype("float32")  # module-global: never leak into other tests

    with pytest.raises(ValueError, match="bn_dtype"):
        set_bn_dtype("float16")

    cfg = {"paths": {}, "tasks": {}, "model_framework": {
        "model_provider": "SegmentationModelsPytorch",
        "SegmentationModelsPytorch": {"encoder_decoder": "resnet18_unet"}},
        "channels": [1, 2, 3], "norm_type": "scaling",
        "classes": {i: [1, f"c{i}"] for i in range(1, 5)}}
    assert cfgmod.validate_train_config(dict(cfg))["bn_dtype"] == "float32"
    with pytest.raises(cfgmod.ConfigError, match="bn_dtype"):
        cfgmod.validate_train_config(dict(cfg, bn_dtype="float16"))
