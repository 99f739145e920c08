"""Sharded training-step tests on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import pytest

from millieye_tpu import parallel


def test_mesh_shapes():
    mesh = parallel.make_mesh(8, model_axis=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    mesh1 = parallel.make_mesh(8, model_axis=1)
    assert mesh1.shape["data"] == 8
    with pytest.raises(ValueError):
        parallel.make_mesh(5, model_axis=2)


def test_param_sharding_specs():
    mesh = parallel.make_mesh(8, model_axis=2)
    params = {
        "wide_conv": np.zeros((1, 1, 256, 490), np.float32),
        "wide_lin": np.zeros((490, 256), np.float32),
        "small": np.zeros((3, 3, 16, 32), np.float32),
    }
    sh = parallel.param_sharding(mesh, params)
    assert "model" in str(sh["wide_conv"].spec)
    assert "model" in str(sh["wide_lin"].spec)
    assert sh["small"].spec == jax.sharding.PartitionSpec()


def test_dryrun_multichip_dp_tp():
    """The driver's multi-chip validation path: full stage-3 train step,
    dp x tp mesh, one real step."""
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dryrun_multichip_dp_only():
    import __graft_entry__ as g
    g.dryrun_multichip(4)


def test_sharded_evaluate_fusion(rng):
    """Data-parallel eval over the virtual mesh matches single-device."""
    import jax.numpy as jnp
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
    from millieye_tpu.eval import harness

    S = 128
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    model = FusionNetwork(darknet, FusionConfig(
        conf_thresh=0.05, max_det=16, max_radar=4, pre_nms_top_k=64))
    params, state = model.init(jax.random.PRNGKey(0))

    b = 8
    rb = np.zeros((b, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, (b, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    tg = np.zeros((b, 5, 5), np.float32)
    tg[..., 1:3] = rng.uniform(0.3, 0.7, (b, 5, 2))
    tg[..., 3:5] = 0.2
    batch = {"images": rng.uniform(size=(b, S, S, 3)).astype(np.float32),
             "radar_maps": rng.uniform(size=(b, S // 16, S // 16, 3)).astype(
                 np.float32),
             "radar_boxes": rb, "rmask": np.ones((b, 4), bool),
             "targets": tg, "tmask": np.ones((b, 5), bool)}

    plain = harness.evaluate_fusion(model, params, state, iter([batch]))
    mesh = parallel.make_mesh(8, model_axis=1)
    sharded = harness.evaluate_fusion(model, params, state, iter([batch]),
                                      mesh=mesh)
    if plain is None:
        assert sharded is None
    else:
        np.testing.assert_allclose(plain[2], sharded[2], rtol=1e-4)


def test_shardmap_fusion_step(rng):
    """Explicit-collective (shard_map + psum) stage-3 step on the virtual
    mesh: runs, loss finite, frozen subtrees bit-identical."""
    import jax.numpy as jnp
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
    from millieye_tpu.train import frozen_adam, STAGE3_FROZEN
    from millieye_tpu.train.steps import init_train_state
    from millieye_tpu.parallel.shard_map_step import make_shardmap_fusion_step

    S = 128
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    model = FusionNetwork(darknet, FusionConfig(
        conf_thresh=0.05, max_det=16, max_radar=4, pre_nms_top_k=64))
    params, state = model.init(jax.random.PRNGKey(0))
    dark0 = [np.array(x) for x in jax.tree.leaves(params["darknet"])]

    mesh = parallel.make_mesh(8, model_axis=1)
    tx = frozen_adam(params, lr=1e-3, frozen_prefixes=STAGE3_FROZEN)
    ts = init_train_state(params, state, tx)
    step = make_shardmap_fusion_step(model, tx, mesh)

    b = 8
    rb = np.zeros((b, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, (b, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    tg = np.zeros((b, 5, 5), np.float32)
    tg[..., 1:3] = rng.uniform(0.3, 0.7, (b, 5, 2))
    tg[..., 3:5] = 0.2
    batch = {"images": rng.uniform(size=(b, S, S, 3)).astype(np.float32),
             "radar_maps": rng.uniform(size=(b, S // 16, S // 16, 3)).astype(
                 np.float32),
             "radar_boxes": rb, "rmask": np.ones((b, 4), bool),
             "targets": tg, "tmask": np.ones((b, 5), bool)}
    ts2, metrics = step(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts2.step) == 1
    for a, b2 in zip(dark0, jax.tree.leaves(ts2.params["darknet"])):
        np.testing.assert_array_equal(a, np.asarray(b2))


def test_train_cli_data_parallel_matches_single(tmp_path):
    """VERDICT r2 #5: the CLI's --data_parallel path (Trainer mesh) must
    produce the same training result as the single-device path — same
    synthetic data, same seed, one epoch; the epoch-end checkpoints are
    compared parameter by parameter."""
    import numpy as np
    from millieye_tpu.cli.train import main

    common = ["--stage", "fusion", "--synthetic", "8", "--epochs", "1",
              "--batch_size", "8", "--img_size", "128", "--seed", "3"]
    main(common + ["--checkpoint_dir", str(tmp_path / "single")])
    main(common + ["--checkpoint_dir", str(tmp_path / "mesh"),
                   "--data_parallel", "4", "--model_parallel", "2"])

    def load_raw(path):
        with np.load(path, allow_pickle=False) as z:
            keys = sorted(z.files, key=lambda k: int(k.split("|")[0]))
            return keys, [z[k] for k in keys]

    ks, flat_s = load_raw(str(tmp_path / "single" / "module3_ckpt_final.npz"))
    km, flat_m = load_raw(str(tmp_path / "mesh" / "module3_ckpt_final.npz"))
    assert ks == km and len(flat_s) > 50
    for k, a, b in zip(ks, flat_s, flat_m):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5,
                                   err_msg=k)
