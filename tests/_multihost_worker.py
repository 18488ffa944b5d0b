"""Subprocess body for tests/test_multihost.py — one process of a real
2-process JAX cluster on CPU.

Run as: python tests/_multihost_worker.py  (cluster shape comes from the
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env the test
sets — the same contract ``yoho_tpu.parallel.mesh.init_distributed``
documents for explicit clusters).

Each process owns 4 local CPU devices; the cluster is 2 x 4 = 8 global
devices, meshed (data=4, model=2). Cross-process collectives ride Gloo —
the CPU stand-in for ICI/DCN — through exactly the framework code a pod
run would use (reference distribution: single-host pmap+pmean,
``train/stages/transcription_pretrain_no_voiceprints.py:194,215``).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from yoho_tpu.parallel.mesh import (  # noqa: E402
    init_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

init_distributed()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    mesh = make_mesh(data=-1, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}, mesh.shape

    # Pin the row-order contract the trainer's validation path relies
    # on: local blocks concatenate PROCESS-MAJOR along the data axis.
    local = np.arange(4, dtype=np.float32) + 4 * jax.process_index()
    g = shard_batch(mesh, local.reshape(4, 1))
    rep = jax.jit(lambda t: t,
                  out_shardings=replicated_sharding(mesh))(g)
    np.testing.assert_array_equal(np.asarray(rep).ravel(),
                                  np.arange(8, dtype=np.float32))

    # A DP grad step through the framework helpers: batch sharded over
    # `data` (spanning both processes), params replicated, loss/grads
    # reduced globally by GSPMD — the multi-host form of the reference's
    # pmean-over-devices training step.
    g = np.random.default_rng(0)
    w = jnp.asarray(g.standard_normal((16, 8)).astype(np.float32))
    x = g.standard_normal((8, 16)).astype(np.float32)

    batch = shard_batch(mesh, {"x": x})

    def loss_fn(w, x):
        y = x @ w
        return (y * y).mean()

    step = jax.jit(
        jax.value_and_grad(loss_fn),
        out_shardings=(replicated_sharding(mesh), replicated_sharding(mesh)),
    )
    loss, grad = step(
        jax.device_put(w, replicated_sharding(mesh)), batch["x"]
    )

    # Every process must agree with the plain local computation (up to
    # reduction-order rounding across the 8-way split).
    ref_loss, ref_grad = jax.value_and_grad(loss_fn)(w, jnp.asarray(x))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(grad)),
        np.asarray(ref_grad),
        rtol=1e-5,
        atol=1e-6,
    )
    print(f"MH_OK pid={jax.process_index()} loss={float(loss):.8f}",
          flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
