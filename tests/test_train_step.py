import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seam_match_rcnn_tpu.config import ModelConfig, RPNConfig, RoIHeadsConfig
from seam_match_rcnn_tpu.models.matchrcnn import MatchRCNN, _select_match_slots, init_model
from seam_match_rcnn_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from seam_match_rcnn_tpu.train.optim import multistep_warmup_schedule, sgd
from seam_match_rcnn_tpu.train.steps import create_train_state, make_phase1_step


def tiny_cfg():
    return ModelConfig(
        rpn=RPNConfig(
            pre_nms_top_n_train=100, post_nms_top_n_train=150,
            pre_nms_top_n_test=50, post_nms_top_n_test=80,
            batch_size_per_image=32,
        ),
        roi_heads=RoIHeadsConfig(batch_size_per_image=64, detections_per_img=10),
        compute_dtype="float32",
    )


def make_batch(b, g=3, hw=(64, 64), seed=0):
    rng = np.random.RandomState(seed)
    boxes = []
    for _ in range(b * g):
        x1, y1 = rng.uniform(0, 30, 2)
        w, h = rng.uniform(10, 30, 2)
        boxes.append([x1, y1, x1 + w, y1 + h])
    boxes = np.asarray(boxes, np.float32).reshape(b, g, 4)
    valid = np.ones((b, g), bool)
    valid[:, -1] = False
    crops = (rng.rand(b, g, 28, 28) > 0.4).astype(np.uint8)
    return {
        "images": jnp.asarray(rng.rand(b, *hw, 3).astype(np.float32)),
        "sizes": jnp.asarray([[hw[0], hw[1]]] * b, jnp.int32),
        "gt": {
            "boxes": jnp.asarray(boxes),
            "labels": jnp.asarray(rng.randint(1, 14, (b, g))),
            "valid": jnp.asarray(valid),
            "pair_ids": jnp.asarray(rng.randint(1, 5, (b, g))),
            "styles": jnp.asarray(rng.randint(0, 3, (b, g))),
            "source": jnp.asarray([i % 2 for i in range(b)], jnp.int32),
            "mask_crops": jnp.asarray(crops),
        },
    }


def test_select_match_slots_per_gt_topk():
    props = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [51, 51, 61, 61]],
        jnp.float32,
    )
    gts = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    idx, valid = _select_match_slots(
        props, jnp.ones(4, bool), gts, jnp.ones(2, bool), k=8
    )
    sel = set(np.asarray(idx)[np.asarray(valid)].tolist())
    # per gt: top 4 rows by iou -> all 4 proposals appear (some twice)
    assert sel == {0, 1, 2, 3}
    assert int(np.asarray(valid).sum()) == 8


def test_phase1_step_runs_and_descends():
    cfg = tiny_cfg()
    model, variables = init_model(cfg, video=False, canvas=(64, 64))
    sched = multistep_warmup_schedule(0.01, (6, 9), 0.1, 100, 10, 1e-3)
    tx = sgd(sched, momentum=0.9)
    state = create_train_state(variables, tx)
    step = make_phase1_step(model, tx)
    batch = make_batch(2)
    losses = None
    for i in range(3):
        state, losses = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(losses["loss"])), losses
    for k in ("loss_objectness", "loss_rpn_box_reg", "loss_classifier",
              "loss_box_reg", "loss_mask", "loss_match"):
        assert k in losses and np.isfinite(float(losses[k]))
    assert int(state.step) == 3


def test_phase1_step_multidevice_dp():
    # Kept minimal: the full training graph compiles slowly under 8-way SPMD
    # on this single-core CPU host; shapes here are the smallest that still
    # exercise batch sharding + in-graph grad psum.  The driver's
    # dryrun_multichip runs the same path.
    assert len(jax.devices()) == 8, "expected virtual 8-device CPU mesh"
    cfg = ModelConfig(
        rpn=RPNConfig(
            pre_nms_top_n_train=30, post_nms_top_n_train=40,
            pre_nms_top_n_test=20, post_nms_top_n_test=30,
            batch_size_per_image=16,
        ),
        roi_heads=RoIHeadsConfig(batch_size_per_image=16, detections_per_img=5),
        compute_dtype="float32",
    )
    model, variables = init_model(cfg, video=False, canvas=(32, 32))
    tx = sgd(lambda s: 0.01, momentum=0.9)
    state = create_train_state(variables, tx)
    step = make_phase1_step(model, tx)
    mesh = make_mesh(data=8, model=1)
    batch = shard_batch(make_batch(8, g=2, hw=(32, 32)), mesh)
    state = replicate(state, mesh)
    state, losses = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["loss"]))
    # params remain replicated after the update (grad psum happened in-graph)
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_schedule_warmup_and_milestones():
    sched = multistep_warmup_schedule(1.0, (2, 4), 0.1, steps_per_epoch=10,
                                      warmup_iters=5, warmup_factor=0.1)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(5)) == pytest.approx(1.0)
    assert float(sched(15)) == pytest.approx(1.0)   # epoch 1, no warmup
    assert float(sched(25)) == pytest.approx(0.1)   # epoch 2 after milestone
    assert float(sched(45)) == pytest.approx(0.01)  # epoch 4


def test_phase1_step_pallas_backend_trains():
    """Phase-1 step with the differentiable Pallas RoIAlign (custom_vjp:
    pallas forward + explicit exact adjoint backward) — finite losses and a
    real parameter update, matching the xla-backend step closely."""
    import dataclasses

    cfg_x = tiny_cfg()
    cfg_p = dataclasses.replace(
        cfg_x,
        roi_heads=dataclasses.replace(
            cfg_x.roi_heads, roi_align_backend="pallas"
        ),
    )
    model_x, variables = init_model(cfg_x, video=False, canvas=(64, 64))
    model_p = MatchRCNN(cfg=cfg_p, video=False)
    tx = sgd(multistep_warmup_schedule(0.01, (6,), 0.1, 10, 10, 0.1),
             momentum=0.9)
    batch = make_batch(2)

    losses = {}
    for name, model in [("xla", model_x), ("pallas", model_p)]:
        state = create_train_state(variables, tx)
        step = make_phase1_step(model, tx)
        st2, out = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(out["loss"]))
        d = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x[0] - x[1]))),
            jax.tree_util.tree_map(lambda a, b: (a, b), st2.params,
                                   state.params),
            0.0,
        )
        assert d > 0.0  # parameters actually moved
        losses[name] = float(out["loss"])
    assert abs(losses["xla"] - losses["pallas"]) < 0.05 * abs(losses["xla"]) + 1e-3


def test_phase1_step_resident_backend_trains():
    """Phase-1 step with the tile-resident RoIAlign (custom_vjp exact-
    adjoint wrapper, VERDICT r2 #7): finite losses, a real update, close to
    the xla-backend step.  Shapes kept minimal — the resident forward runs
    in pallas interpret mode on CPU."""
    import dataclasses

    cfg_x = ModelConfig(
        rpn=RPNConfig(pre_nms_top_n_train=30, post_nms_top_n_train=40,
                      pre_nms_top_n_test=20, post_nms_top_n_test=30,
                      batch_size_per_image=16),
        roi_heads=RoIHeadsConfig(batch_size_per_image=16, detections_per_img=5),
        compute_dtype="float32",
    )
    cfg_r = dataclasses.replace(
        cfg_x, roi_heads=dataclasses.replace(
            cfg_x.roi_heads, roi_align_backend="pallas_resident"))
    model_x, variables = init_model(cfg_x, video=False, canvas=(32, 32))
    model_r = MatchRCNN(cfg=cfg_r, video=False)
    tx = sgd(lambda s: 0.01, momentum=0.9)
    batch = make_batch(2, g=2, hw=(32, 32))

    losses = {}
    for name, model in [("xla", model_x), ("resident", model_r)]:
        state = create_train_state(variables, tx)
        step = make_phase1_step(model, tx)
        st2, out = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(out["loss"]))
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(st2.params),
                            jax.tree.leaves(state.params)))
        assert moved
        losses[name] = float(out["loss"])
    assert abs(losses["xla"] - losses["resident"]) < \
        0.05 * abs(losses["xla"]) + 1e-3


def test_phase1_grad_apply_matches_single_step():
    """With one bucket (weight 1.0), the (grad, accum, apply) triple must
    reproduce make_phase1_step exactly; with two half-batches accumulated at
    weight 0.5 each, the update must equal the full-batch step (the mixed-
    orientation one-update-per-batch semantics, reference engine.py:62-64)."""
    from seam_match_rcnn_tpu.train.steps import make_phase1_grad_apply

    cfg = tiny_cfg()
    model, variables = init_model(cfg, video=False, canvas=(64, 64))
    tx = sgd(lambda s: 0.01, momentum=0.9)
    state0 = create_train_state(variables, tx)
    step = make_phase1_step(model, tx)
    grad_fn, accum_fn, apply_fn = make_phase1_grad_apply(model, tx)
    batch = make_batch(2)
    rng = jax.random.PRNGKey(0)

    ref_state, ref_losses = step(state0, batch, rng)
    g, losses, stats = grad_fn(state0, batch, rng, jnp.float32(1.0))
    out_state = apply_fn(state0, g, stats)
    assert int(out_state.step) == 1
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(out_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert float(losses["loss"]) == float(ref_losses["loss"])

    # two buckets, same PRNG per bucket as a pure-accumulation check:
    # grads(w=.5)+grads(w=.5) over the SAME batch == grads(w=1.0)
    g1, _, stats1 = grad_fn(state0, batch, rng, jnp.float32(0.5))
    g2, _, _ = grad_fn(state0, batch, rng, jnp.float32(0.5))
    acc = accum_fn(g1, g2)
    out2 = apply_fn(state0, acc, stats1)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(out2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_engine_mixed_orientation_single_update():
    """train_one_epoch_matchrcnn with the accumulation triple performs ONE
    optimizer update for a mixed portrait+landscape batch."""
    import dataclasses

    from seam_match_rcnn_tpu.config import TransformConfig
    from seam_match_rcnn_tpu.train.engine import train_one_epoch_matchrcnn
    from seam_match_rcnn_tpu.train.steps import make_phase1_grad_apply

    cfg = dataclasses.replace(
        tiny_cfg(), transform=TransformConfig(min_size=48, max_size=64))
    model, variables = init_model(
        cfg, video=False, canvas=cfg.transform.landscape_canvas)
    tx = sgd(lambda s: 0.01, momentum=0.9)
    state = create_train_state(variables, tx)
    triple = make_phase1_grad_apply(model, tx)

    rng = np.random.RandomState(0)

    def target(g=2):
        return {
            "boxes": np.asarray([[2, 2, 20, 20], [5, 5, 25, 25]], np.float32)[:g],
            "labels": np.asarray([1, 2], np.int64)[:g],
            "pair_ids": np.asarray([1, 1], np.int64)[:g],
            "styles": np.asarray([1, 1], np.int64)[:g],
            "sources": np.asarray([0, 0], np.int64)[:g],
            "mask_crops": (rng.rand(g, 28, 28) > 0.5).astype(np.uint8),
        }

    # one landscape (W>H) + one portrait (H>W) image -> two canvas buckets
    images = [rng.rand(40, 60, 3).astype(np.float32),
              rng.rand(60, 40, 3).astype(np.float32)]
    targets = [target(), target()]
    data = [(images, targets, [0, 1])]
    state, _ = train_one_epoch_matchrcnn(
        model, state, triple, data, epoch=0, rng=jax.random.PRNGKey(0),
        print_freq=10, g_max=4)
    assert int(state.step) == 1
