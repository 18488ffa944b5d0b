import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoho_tpu.parallel import (
    AXIS_DATA,
    AXIS_MODEL,
    make_mesh,
    shard_batch,
    shard_params,
    partition_specs,
)
from jax.sharding import PartitionSpec as P


def test_devices_are_faked():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {AXIS_DATA: 8, AXIS_MODEL: 1}
    mesh = make_mesh(model=2)
    assert mesh.shape == {AXIS_DATA: 4, AXIS_MODEL: 2}
    with pytest.raises(ValueError):
        make_mesh(model=3)
    with pytest.raises(ValueError):
        make_mesh(data=2, model=2)


def test_shard_batch_and_psum():
    mesh = make_mesh(model=1)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec == P(AXIS_DATA, None)

    # A jitted global mean over the data axis must equal the host mean —
    # this is the pmean-replacement path.
    out = jax.jit(lambda b: jnp.mean(b["x"]))(sharded)
    assert np.allclose(out, batch["x"].mean())


def test_partition_rules():
    params = {
        "encoder": {
            "blocks_0": {
                "attn": {"q_proj": {"kernel": np.zeros((16, 16))}},
                "mlp": {"fc1": {"kernel": np.zeros((16, 64))}},
            },
            "ln": {"scale": np.zeros((16,))},
        }
    }
    specs = partition_specs(params)
    assert specs["encoder"]["blocks_0"]["attn"]["q_proj"]["kernel"] == P(None, AXIS_MODEL)
    assert specs["encoder"]["blocks_0"]["mlp"]["fc1"]["kernel"] == P(None, AXIS_MODEL)
    assert specs["encoder"]["ln"]["scale"] == P()


def test_shard_params_on_mesh():
    mesh = make_mesh(model=2)
    params = {"attn": {"q_proj": {"kernel": np.zeros((16, 16), np.float32)}}}
    sharded = shard_params(params, mesh)
    spec = sharded["attn"]["q_proj"]["kernel"].sharding.spec
    assert spec == P(None, AXIS_MODEL)

    # Non-divisible shapes fall back to replication instead of erroring.
    odd = {"attn": {"q_proj": {"kernel": np.zeros((16, 15), np.float32)}}}
    sharded = shard_params(odd, mesh)
    assert sharded["attn"]["q_proj"]["kernel"].sharding.spec == P()


def test_local_batch_size_single_process():
    from yoho_tpu.parallel.mesh import local_batch_size

    # Single-process (this test env): the local batch IS the global batch.
    assert local_batch_size(32) == 32


def test_barrier_noop_single_process():
    from yoho_tpu.parallel.mesh import barrier

    barrier("test")  # must not raise or block when process_count() == 1


def test_partition_specs_mesh_fallback():
    """partition_specs(mesh=) applies the documented replication
    fallback for non-dividing shapes; without a mesh the raw rank-fitted
    spec comes back (shard_params applies the fallback itself)."""
    from jax.sharding import PartitionSpec as P

    from yoho_tpu.parallel.sharding import partition_specs

    mesh = make_mesh(model=2)
    params = {"attn": {"q_proj": {"kernel": np.zeros((16, 15), np.float32)}},
              "mlp": {"w1": {"kernel": np.zeros((16, 16), np.float32)}}}
    fitted = partition_specs(params, mesh=mesh)
    assert fitted["attn"]["q_proj"]["kernel"] == P()  # 15 % 2 -> replicate
    raw = partition_specs(params)
    assert raw["attn"]["q_proj"]["kernel"] != P() or \
        raw["mlp"]["w1"]["kernel"] != P()  # rules matched, un-fallbacked


def test_replicate_jit_cached_per_mesh():
    from yoho_tpu.parallel.mesh import _replicate_jit

    mesh = make_mesh(model=1)
    assert _replicate_jit(mesh) is _replicate_jit(mesh)
