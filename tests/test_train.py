"""Train-step + optimizer + checkpoint tests (small shapes, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
from millieye_tpu.train import (frozen_adam, STAGE3_FROZEN, label_tree,
                                make_fusion_train_step, make_yolo_train_step)
from millieye_tpu.train.steps import init_train_state
from millieye_tpu.io.checkpoint import save_checkpoint, load_checkpoint

S = 128


@pytest.fixture(scope="module")
def fusion():
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S), img_size=S)
    cfg = FusionConfig(conf_thresh=0.05, max_det=16, max_radar=4,
                       pre_nms_top_k=64)
    model = FusionNetwork(darknet, cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


def fusion_batch(rng, b=2):
    rb = np.zeros((b, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(b, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    targets = np.zeros((b, 5, 5), np.float32)
    targets[..., 1:3] = rng.uniform(0.3, 0.7, size=(b, 5, 2))
    targets[..., 3:5] = rng.uniform(0.1, 0.2, size=(b, 5, 2))
    return {
        "images": rng.uniform(size=(b, S, S, 3)).astype(np.float32),
        "radar_maps": rng.uniform(size=(b, S // 16, S // 16, 3)).astype(
            np.float32),
        "radar_boxes": rb,
        "rmask": np.ones((b, 4), bool),
        "targets": targets,
        "tmask": np.ones((b, 5), bool),
    }


def test_label_tree_marks_frozen(fusion):
    _, params, _ = fusion
    labels = label_tree(params, STAGE3_FROZEN)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    freeze = [p for p, l in flat if l == "freeze"]
    train = [p for p, l in flat if l == "train"]
    assert freeze and train
    # everything under darknet and img_cnn frozen; radar_enc trainable
    for path, label in flat:
        top = str(path[0].key)
        if top in ("darknet", "img_cnn"):
            assert label == "freeze", path
        if top in ("radar_enc", "ensemble"):
            assert label == "train", path


def test_fusion_train_step_freezes_subtree(fusion, rng):
    model, params, state = fusion
    tx = frozen_adam(params, lr=1e-3, frozen_prefixes=STAGE3_FROZEN,
                     every_k=1)
    ts = init_train_state(params, state, tx)
    step = jax.jit(make_fusion_train_step(model, tx))
    batch = fusion_batch(rng)
    ts2, metrics = step(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts2.step) == 1
    # frozen leaves bit-identical
    for a, b in zip(jax.tree.leaves(params["img_cnn"]),
                    jax.tree.leaves(ts2.params["img_cnn"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(params["darknet"]),
                    jax.tree.leaves(ts2.params["darknet"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accumulation_updates_every_k(fusion, rng):
    model, params, state = fusion
    tx = frozen_adam(params, lr=1e-3, frozen_prefixes=STAGE3_FROZEN,
                     every_k=2)
    ts = init_train_state(params, state, tx)
    step = jax.jit(make_fusion_train_step(model, tx))
    batch = fusion_batch(rng)
    ts1, _ = step(ts, batch, jax.random.PRNGKey(1))
    # after 1 micro-step params unchanged (accumulating)
    for a, b in zip(jax.tree.leaves(params["radar_enc"]),
                    jax.tree.leaves(ts1.params["radar_enc"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ts1.opt_state.mini_step) == 1
    assert int(ts1.opt_state.gradient_step) == 0
    ts2, _ = step(ts1, batch, jax.random.PRNGKey(2))
    # second micro-step closes the accumulation window (train.py:188-191)
    assert int(ts2.opt_state.mini_step) == 0
    assert int(ts2.opt_state.gradient_step) == 1


def test_yolo_train_step_updates_backbone(rng):
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    params, state = darknet.init(jax.random.PRNGKey(0))
    tx = frozen_adam(params, lr=1e-3, every_k=1)
    ts = init_train_state(params, state, tx)
    step = jax.jit(make_yolo_train_step(darknet, tx))
    batch = {
        "images": rng.uniform(size=(2, S, S, 3)).astype(np.float32),
        "targets": fusion_batch(rng)["targets"],
        "tmask": np.ones((2, 5), bool),
    }
    ts2, metrics = step(ts, batch, None)
    assert np.isfinite(float(metrics["loss"]))
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(params), jax.tree.leaves(ts2.params)))
    assert diff > 0.0
    # BN running stats moved
    sdiff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(state), jax.tree.leaves(ts2.state)))
    assert sdiff > 0.0


def test_checkpoint_roundtrip(tmp_path, fusion):
    model, params, state = fusion
    tree = {"params": params, "state": state, "step": jnp.ones(())}
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, tree)
    restored = load_checkpoint(path, tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_rejects_mismatched_template(tmp_path, fusion):
    model, params, state = fusion
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, {"params": params})
    with pytest.raises(ValueError):
        load_checkpoint(path, {"params": params, "extra": jnp.zeros(3)})


def test_orbax_roundtrip(tmp_path, fusion):
    from millieye_tpu.io.checkpoint import save_orbax, load_orbax
    _, params, _ = fusion
    path = str(tmp_path / "orbax_ckpt")
    tree = {"ensemble": params["ensemble"]}
    save_orbax(path, jax.tree.map(np.asarray, tree))
    back = load_orbax(path)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multiscale_yolo_training(rng):
    """Multiscale training recompiles once per distinct size and keeps
    training (ListDataset.collate_fn semantics, module2 datasets.py:158-162)."""
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    params, state = darknet.init(jax.random.PRNGKey(0))
    tx = frozen_adam(params, lr=1e-3, every_k=1)
    ts = init_train_state(params, state, tx)
    step = jax.jit(make_yolo_train_step(darknet, tx))
    tg = np.zeros((2, 4, 5), np.float32)
    tg[..., 1:3] = rng.uniform(0.3, 0.7, (2, 4, 2))
    tg[..., 3:5] = 0.2
    for size in (96, 128, 96):          # revisit 96: cache hit
        batch = {"images": rng.uniform(size=(2, size, size, 3)).astype(
                     np.float32),
                 "targets": tg, "tmask": np.ones((2, 4), bool)}
        ts, metrics = step(ts, batch, None)
        assert np.isfinite(float(metrics["loss"])), size
    assert int(ts.step) == 3


def test_grad_clip_survives_nan_and_inf_grads():
    """One poisoned batch must skew a step, not kill the run: the
    zero_nans -> clip -> zero_nans chain zeroes NaN/inf gradients and
    bounds finite spikes (frozen_adam(grad_clip=...))."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from millieye_tpu.train.optim import frozen_adam

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    tx = frozen_adam(params, lr=0.1, grad_clip=1.0)
    opt = tx.init(params)
    for bad in (jnp.nan, jnp.inf, -jnp.inf, 1e30):
        grads = {"w": jnp.full((4,), bad), "b": jnp.ones((2,))}
        updates, opt = tx.update(grads, opt, params)
        leaves = jax.tree.leaves(updates)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves), bad


def test_train_state_finite_guard():
    """A batch that poisons the forward (huge values -> NaN loss) must not
    corrupt params or BN running stats; nonfinite_reverted reports it."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    from millieye_tpu.train.optim import frozen_adam
    from millieye_tpu.train.steps import init_train_state, make_yolo_train_step

    S = 64
    model = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S), img_size=S)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = frozen_adam(params, lr=1e-3, grad_clip=10.0)
    ts = init_train_state(params, state, tx)
    step = jax.jit(make_yolo_train_step(model, tx))

    targets = np.zeros((2, 3, 5), np.float32)
    targets[:, 0] = (0, 0.5, 0.5, 0.3, 0.3)
    tmask = np.zeros((2, 3), bool)
    tmask[:, 0] = True
    poison = {"images": np.full((2, S, S, 3), 1e30, np.float32),
              "targets": targets, "tmask": tmask}
    ts, metrics = step(ts, poison, jax.random.PRNGKey(1))
    for leaf in jax.tree.leaves((ts.params, ts.state)):
        assert np.isfinite(np.asarray(leaf)).all()
    # training continues on a sane batch afterwards
    sane = dict(poison, images=np.random.default_rng(0).uniform(
        size=(2, S, S, 3)).astype(np.float32))
    ts, metrics = step(ts, sane, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_masked_mean_ignores_poison_outside_mask():
    import jax.numpy as jnp
    import numpy as np
    from millieye_tpu.models.yolo_head import _masked_mean
    v = jnp.asarray([1.0, jnp.nan, jnp.inf, 3.0])
    m = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    assert float(_masked_mean(v, m)) == 2.0
    # gradient path of masked-out cells is dead, not NaN
    import jax
    g = jax.grad(lambda x: _masked_mean(x, m))(v)
    assert np.isfinite(np.asarray(g)).all()


def test_yolo_loss_gradient_survives_poisoned_unassigned_cells():
    """NaN predictions in cells outside obj/noobj masks must not NaN the
    loss gradient (0 * NaN backward trap)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from millieye_tpu.models.yolo_head import yolo_scale_loss

    B, A, G, C = 1, 3, 4, 2
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.1, 0.9, (B, A, G, G, 5 + C)).astype(np.float32)
    targets = np.zeros((B, 1, 5), np.float32)
    targets[0, 0] = (0, 0.52, 0.52, 0.4, 0.4)
    tmask = np.ones((B, 1), bool)
    anchors = np.array([[10.0, 10.0], [20.0, 20.0], [30.0, 30.0]])

    def loss_of(p):
        return yolo_scale_loss(p, anchors, 64.0 / G, jnp.asarray(targets),
                               jnp.asarray(tmask))[0]

    # poison a far-away cell that no target assigns and no noobj BCE needs
    # to survive: x/y/w/h/cls channels NaN there
    pred_bad = pred.copy()
    pred_bad[0, 0, 0, 0, :4] = np.nan
    pred_bad[0, 0, 0, 0, 5:] = np.nan
    g = jax.grad(loss_of)(jnp.asarray(pred_bad))
    finite = np.isfinite(np.asarray(g))
    # gradients at all non-poisoned cells stay finite
    mask = np.ones_like(finite, bool)
    mask[0, 0, 0, 0] = False
    assert finite[mask].all()
    assert np.isfinite(float(loss_of(jnp.asarray(pred_bad)))) or True
    v = loss_of(jnp.asarray(pred_bad))
    assert np.isfinite(float(v))
