"""Child process for the multi-host (DCN) distributed test.

Invoked by tests/test_distributed_multiproc.py as
``python tests/dcn_child.py PORT PID NPROC OUTDIR``.  Two of these form a
2-process jax.distributed cluster over localhost (the CPU stand-in for DCN,
the same coordination/collective path production multi-host uses), each
exposing 2 virtual devices -> a 4-device global (dp) mesh.
"""

import json
import os
import sys


def main():
    port, pid, nproc, outdir = sys.argv[1:5]
    pid, nproc = int(pid), int(nproc)

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from unetseg_tpu import train
    from unetseg_tpu.config import ModelConfig
    from unetseg_tpu.parallel import distributed as dist

    ok = dist.initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid,
    )
    assert ok, "initialize_distributed returned False for a 2-process run"
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    # --- global (dp) mesh spanning both processes ---------------------------
    mesh = dist.global_mesh(sp=1)
    assert mesh.devices.size == 2 * nproc

    # --- one sharded train step: batch split across hosts, grads all-reduce
    # over DCN (the localhost stand-in) ---------------------------------------
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = ModelConfig(base_channels=4, depth=2, image_size=32,
                      compute_dtype="float32")
    tx = train.make_optimizer(lr=1e-3, total_steps=10)
    state = train.init_state(jax.random.key(0), cfg, tx)
    # host pytree: identical on all processes (same seed); jit replicates it
    state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = train.make_sharded_train_step(cfg, mesh, tx)

    rng = np.random.default_rng(0)  # same global batch everywhere
    g_imgs = rng.random((8, 32, 32, 1)).astype(np.float32)
    g_labels = ((rng.random((8, 32, 32)) > 0.5).astype(np.int32)) * 2

    img_s = NamedSharding(mesh, P("dp", "sp"))
    lo, hi = pid * 4, (pid + 1) * 4  # this host's rows of the global batch
    imgs = jax.make_array_from_process_local_data(img_s, g_imgs[lo:hi])
    labels = jax.make_array_from_process_local_data(img_s, g_labels[lo:hi])

    state, loss = step(train.TrainState(**state._asdict()), (imgs, labels))
    loss = float(jax.block_until_ready(loss))
    assert np.isfinite(loss)

    # --- study-level sharding (the zero-communication inference axis) -------
    studies = [f"study_{i}" for i in range(5)]
    mine = dist.shard_studies(studies)

    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump({"pid": pid, "loss": loss, "studies": mine,
                   "devices": jax.device_count()}, f)
    print("child ok", pid)


if __name__ == "__main__":
    main()
