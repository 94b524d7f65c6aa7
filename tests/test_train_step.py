"""Train-step + multichip sharding tests (virtual 8-device CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lass_tpu.data.mixer import SegmentMixer
from lass_tpu.models.resunet import ResUNet30
from lass_tpu.parallel.mesh import (
    batch_sharding, make_mesh, param_shardings, replicated)
from lass_tpu.tasks.audiosep import AudioSepTask
from lass_tpu.train.optim import build_optimizer


@pytest.fixture(scope="module")
def task():
    return AudioSepTask(
        model=ResUNet30(),
        mixer=SegmentMixer(2, -10, 10),
        optimizer=build_optimizer("AdamW", 1e-3, "constant_warm_up",
                                  10000, 1000000),
    )


def test_single_device_train_step_reduces_loss(task, rng):
    state = task.init_state(jax.random.PRNGKey(0), 16000)
    batch = {
        "waveform": jnp.asarray(
            rng.randn(2, 1, 16000).astype(np.float32) * 0.1),
        "condition": jnp.asarray(rng.randn(2, 512).astype(np.float32)),
    }
    step = jax.jit(task.train_step)
    losses = []
    s = state
    for _ in range(3):
        s, metrics = step(s, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["train_loss"]))
    assert int(s.step) == 3
    assert all(np.isfinite(l) for l in losses)
    assert float(metrics["grad_norm"]) > 0


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as ge
    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 1, 160000)
