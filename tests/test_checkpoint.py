import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbdc_tpu.models import ELIC
from rgbdc_tpu.training import create_train_state, make_dual_optimizer
from rgbdc_tpu.training.checkpoint import (
    load_params,
    restore_checkpoint,
    save_checkpoint,
)

TINY = dict(N=8, M=12, slice_ch=(4, 8), in_ch=3)


@pytest.fixture(scope="module")
def state():
    model = ELIC(**TINY)
    tx = make_dual_optimizer(1e-4)
    return create_train_state(
        model, jax.random.PRNGKey(0), (jnp.zeros((1, 64, 64, 3)),), tx
    )


def _tree_equal(a, b):
    return all(
        np.array_equal(x, y)
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


class TestCheckpoint:
    def test_save_best_and_meta(self, state, tmp_path):
        save_checkpoint(state, epoch=3, loss=1.25, ckpt_dir=str(tmp_path), is_best=True)
        assert (tmp_path / "checkpoint_latest.msgpack").exists()
        assert (tmp_path / "checkpoint_best_loss.msgpack").exists()
        meta = json.loads((tmp_path / "checkpoint_latest.json").read_text())
        assert meta["epoch"] == 3 and meta["loss"] == 1.25

    def test_restore_full_state(self, state, tmp_path):
        save_checkpoint(state, 0, 2.0, str(tmp_path))
        restored, meta = restore_checkpoint(
            state, str(tmp_path / "checkpoint_latest.msgpack")
        )
        assert _tree_equal(restored.params, state.params)
        assert _tree_equal(restored.opt_state, state.opt_state)

    def test_params_only_restore(self, state, tmp_path):
        save_checkpoint(state, 0, 2.0, str(tmp_path))
        restored, _ = restore_checkpoint(
            state, str(tmp_path / "checkpoint_latest.msgpack"), params_only=True
        )
        assert _tree_equal(restored.params, state.params)

    def test_load_params_both_payloads(self, state, tmp_path):
        from flax import serialization

        save_checkpoint(state, 0, 2.0, str(tmp_path))
        p1 = load_params(str(tmp_path / "checkpoint_latest.msgpack"), state.params)
        bare = tmp_path / "bare.msgpack"
        bare.write_bytes(serialization.to_bytes({"params": state.params}))
        p2 = load_params(str(bare), state.params)
        assert _tree_equal(p1, state.params) and _tree_equal(p2, state.params)

    def test_snapshot_every(self, state, tmp_path):
        save_checkpoint(state, 200, 2.0, str(tmp_path), snapshot_every=200)
        assert (tmp_path / "checkpoint_epoch200.msgpack").exists()


class TestDataLoader:
    def test_drop_last_and_shapes(self):
        from rgbdc_tpu.data import DataLoader, SyntheticRGBD

        ds = SyntheticRGBD(n=7, size=64, channel=4)
        dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
        batches = list(dl)
        assert len(batches) == 3
        rgb, depth = batches[0]
        assert rgb.shape == (2, 64, 64, 3) and depth.shape == (2, 64, 64, 1)

    def test_epoch_reshuffles(self):
        from rgbdc_tpu.data import DataLoader, SyntheticRGBD

        ds = SyntheticRGBD(n=8, size=16, channel=3)
        dl = DataLoader(ds, batch_size=8, shuffle=True)
        (a,) = next(iter(dl))
        (b,) = next(iter(dl))
        assert not np.array_equal(a, b)  # different epoch order
