"""Checkpoint edge cases: shape mismatch detection, missing keys, scalar
roundtrip — guards the reload path every analysis tool depends on."""
import numpy as np
import pytest

import jax

from elliptic_gnn_tpu.train import checkpoint


def test_roundtrip_with_scalars(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": [np.ones(4), {"c": np.zeros((2, 2))}]}
    path = str(tmp_path / "t.ckpt")
    checkpoint.save_pytree(path, tree, extra_scalars={"epoch": 7, "best": 0.5})
    template = jax.tree_util.tree_map(np.zeros_like, tree)
    restored, scalars = checkpoint.load_into_pytree(path, template)
    np.testing.assert_array_equal(restored["a"], tree["a"])
    np.testing.assert_array_equal(restored["b"][1]["c"], tree["b"][1]["c"])
    assert int(scalars["epoch"]) == 7
    assert float(scalars["best"]) == 0.5


def test_shape_mismatch_rejected(tmp_path):
    path = str(tmp_path / "t.ckpt")
    checkpoint.save_pytree(path, {"w": np.zeros((3, 3))})
    with pytest.raises(ValueError, match="shape mismatch"):
        checkpoint.load_into_pytree(path, {"w": np.zeros((4, 4))})


def test_missing_key_rejected(tmp_path):
    path = str(tmp_path / "t.ckpt")
    checkpoint.save_pytree(path, {"w": np.zeros(3)})
    with pytest.raises(KeyError):
        checkpoint.load_into_pytree(path, {"w": np.zeros(3), "extra": np.ones(2)})
