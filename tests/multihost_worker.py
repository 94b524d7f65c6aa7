"""Worker process for the TRUE 2-process multi-host test
(tests/test_multihost.py::test_two_process_train_step_and_checkpoint).

Launched twice with a shared coordinator address (the analog of the
reference's `num_nodes` DDP launch, train.py:269-270). Each process owns
4 virtual CPU devices; together they form one 8-device global mesh. The
worker runs ONE global sharded AudioSep train step fed through
put_global_batch (per-host local shards only) and an orbax multi-host
checkpoint save + restore, then prints a parseable result line.

Usage (env must set JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=4 before start):

    python tests/multihost_worker.py <coordinator> <num_procs> <proc_id> \
        <ckpt_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, num_procs, proc_id, ckpt_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lass_tpu.parallel.host import (
        host_info, initialize_multihost, put_global_batch,
        shard_indices_for_host)

    initialize_multihost(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=proc_id)
    idx, count = host_info()
    assert count == num_procs and idx == proc_id, (idx, count)

    from lass_tpu.data.mixer import SegmentMixer
    from lass_tpu.models.resunet import ResUNet30
    from lass_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from lass_tpu.tasks.audiosep import AudioSepTask
    from lass_tpu.train.optim import build_optimizer

    devices = jax.devices()  # global: num_procs * 4 CPU devices
    assert len(devices) == num_procs * 4, len(devices)
    mesh = make_mesh(devices)  # pure data-parallel global mesh

    segment = 4000
    global_batch = len(devices)  # one row per device on the 'data' axis
    task = AudioSepTask(
        model=ResUNet30(),
        mixer=SegmentMixer(max_mix_num=2, lower_db=-10, higher_db=10),
        optimizer=build_optimizer("AdamW", 1e-3, "constant_warm_up",
                                  10, 100),
    )
    state = task.init_state(jax.random.PRNGKey(0), segment)
    rep = replicated(mesh)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)

    # every host computes the SAME global permutation and takes its slice
    rng = np.random.RandomState(0)
    wave_global = rng.randn(global_batch, 1, segment).astype(np.float32) * 0.1
    cond_global = rng.randn(global_batch, 512).astype(np.float32)
    rows = shard_indices_for_host(np.arange(global_batch), idx, count)
    bs = batch_sharding(mesh)
    batch = put_global_batch(
        {"waveform": wave_global[rows], "condition": cond_global[rows]}, bs)
    assert batch["waveform"].shape == (global_batch, 1, segment)

    with mesh:
        new_state, metrics = jax.jit(task.train_step)(
            state, batch, jax.device_put(jax.random.PRNGKey(1), rep))
        loss = float(metrics["train_loss"])
    assert np.isfinite(loss), loss

    # orbax multi-host save + restore round-trip across both processes
    from lass_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt_dir, save_step_frequency=1)
    tree = {"params": new_state.params, "batch_stats": new_state.batch_stats}
    mgr.maybe_save(1, tree)
    mgr.wait()
    restored = mgr.restore(tree, step=1)  # template carries the shardings
    ref_leaf = jax.tree_util.tree_leaves(tree)[0]
    got_leaf = jax.tree_util.tree_leaves(restored)[0]
    np.testing.assert_allclose(
        np.asarray(got_leaf.addressable_data(0)),
        np.asarray(ref_leaf.addressable_data(0)), atol=1e-6)

    print(f"MULTIHOST_OK process={idx}/{count} loss={loss:.6f}")


if __name__ == "__main__":
    main()
