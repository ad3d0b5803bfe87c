"""Worker for the REAL two-process jax.distributed test (test_distributed.py).

Each process owns 2 virtual CPU devices; ``maybe_initialize_distributed``
wires the DCN control plane (coordinator + gloo collectives, the same code
path a multi-host TPU pod uses); the global mesh spans all 4 devices. The
worker then runs ONE data-parallel train step on a globally-sharded batch
(host-local rows -> ``jax.make_array_from_process_local_data``) and asserts
the loss equals the unsharded full-batch loss computed in-process — i.e.
cross-process data parallelism is numerically the same program.

Run: python tests/_dist_worker.py <process_id> <coordinator_port>
"""

import os
import sys


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    # Drop any inherited device-count forcing (pytest's conftest exports
    # an 8-device flag) before pinning this worker to 2 local devices.
    inherited = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
    os.environ["XLA_FLAGS"] = " ".join(
        inherited + ["--xla_force_host_platform_device_count=2"]
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    from unet_implementations_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from unet_implementations_tpu.data.synthetic import synthetic_batch
    from unet_implementations_tpu.models.unet import UNet
    from unet_implementations_tpu.training import (
        create_train_state,
        make_segmentation_train_step,
        sgd_nesterov,
    )

    # Global batch of 4: this host contributes rows [2*pid, 2*pid+2).
    host = synthetic_batch(0, 4, size=32)
    batch_np = {k: np.asarray(host[k]) for k in ("image", "mask")}

    model = UNet(features_per_stage=(8, 16), strides=(1, 2),
                 encoder_dropout_rates=(0.0, 0.0),
                 decoder_dropout_rates=(0.0,))
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(batch_np["image"][:1]),
        sgd_nesterov(),
    )

    mesh = Mesh(np.array(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("data"))

    state = jax.device_put(state, repl)
    gbatch = {
        k: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))),
            v[2 * pid:2 * pid + 2],
            v.shape,
        )
        for k, v in batch_np.items()
    }

    step = make_segmentation_train_step(donate=False)
    new_state, loss = step(state, gbatch, jax.random.key(1))
    jax.block_until_ready(new_state.params)

    # Reference: the SAME step on the replicated (unsharded) full batch.
    rbatch = {k: jax.device_put(jnp.asarray(v), repl)
              for k, v in batch_np.items()}
    _, ref_loss = step(state, rbatch, jax.random.key(1))

    # ``loss`` is fully replicated (scalar jit output over global inputs),
    # so every process may read it directly; each asserts independently and
    # the parent test requires BOTH exit codes to be 0.
    assert np.isclose(float(loss), float(ref_loss), rtol=5e-5), (
        float(loss), float(ref_loss)
    )
    print(f"proc{pid}: dp-across-processes loss == unsharded loss "
          f"({float(ref_loss):.6f})", flush=True)
    _ = rows  # (kept for clarity of the two shardings in play)


if __name__ == "__main__":
    main()
