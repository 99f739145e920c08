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
