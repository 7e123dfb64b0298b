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


def test_resume_preserves_best_model(tmp_path):
    """A resumed run whose later epochs never beat the stored best must
    still restore the true best params (ADVICE round 1)."""
    outdir = str(tmp_path)
    params = {"w": np.full(3, 2.0, np.float32)}
    state = {"bn": np.zeros(2, np.float32)}
    opt = {"m": np.zeros(3, np.float32)}
    best_params = {"w": np.full(3, 9.0, np.float32)}
    best_state = {"bn": np.ones(2, np.float32)}
    checkpoint.save_resume(outdir, params, state, opt, epoch=5, best_val=0.8,
                           bad_epochs=2, best_params=best_params,
                           best_state=best_state)
    (p, s, o, ep, bv, bad, bp, bs) = checkpoint.load_resume(
        outdir, params, state, opt)
    assert ep == 5 and bv == 0.8 and bad == 2
    np.testing.assert_array_equal(p["w"], params["w"])
    np.testing.assert_array_equal(bp["w"], best_params["w"])
    np.testing.assert_array_equal(bs["bn"], best_state["bn"])


def test_resume_legacy_format_resets_best(tmp_path):
    """Old resume.ckpt without best-model keys: best_val resets to -1 so a
    non-best current model is never reported as the stored best."""
    outdir = str(tmp_path)
    params = {"w": np.full(3, 2.0, np.float32)}
    state = {"bn": np.zeros(2, np.float32)}
    opt = {"m": np.zeros(3, np.float32)}
    checkpoint.save_pytree(
        str(tmp_path / "resume.ckpt"),
        {"params": params, "state": state, "opt_state": opt},
        extra_scalars={"epoch": 4, "best_val": 0.9, "bad": 1},
    )
    (p, s, o, ep, bv, bad, bp, bs) = checkpoint.load_resume(
        outdir, params, state, opt)
    assert ep == 4 and bv == -1.0
    np.testing.assert_array_equal(bp["w"], params["w"])
