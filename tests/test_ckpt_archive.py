"""Durable params-only checkpoint archives (train/checkpoint.py).

Orbax run checkpoints are gitignored, so trained weights only survive a
fresh clone if the flagship params are archived to a committable
single-file snapshot. Round 3 lost the roach_bc3/bc4 experts and the
evaluated student checkpoint exactly this way — these tests pin the
archive/restore roundtrip (incl. the bf16 cast and the restore_pytree
dispatch) so the recovery path stays sound.
"""

import numpy as np
import jax.numpy as jnp

from thinktwice_tpu.train import checkpoint as ckpt_lib


def _params():
    return {
        "dense": {"kernel": np.linspace(-2, 2, 12, dtype=np.float32)
                  .reshape(3, 4),
                  "bias": np.zeros((4,), np.float32)},
        "step_like": np.asarray(7, np.int32),
        "bf16_native": jnp.ones((2, 2), jnp.bfloat16) * 1.5,
    }


def test_archive_roundtrip(tmp_path):
    p = _params()
    path = str(tmp_path / "params.msgpack")
    ckpt_lib.archive_params(path, p)
    restored = ckpt_lib.restore_archive(path, _params())
    # dtypes come back as the template's
    assert restored["dense"]["kernel"].dtype == np.float32
    assert restored["step_like"].dtype == np.int32
    # float payloads went through bf16: equal within bf16 resolution
    np.testing.assert_allclose(
        restored["dense"]["kernel"], p["dense"]["kernel"],
        rtol=1e-2, atol=1e-2)
    assert int(restored["step_like"]) == 7
    # ints are exact
    np.testing.assert_array_equal(restored["dense"]["bias"],
                                  p["dense"]["bias"])


def test_restore_pytree_dispatches_msgpack(tmp_path):
    p = _params()
    path = str(tmp_path / "params.msgpack")
    ckpt_lib.archive_params(path, p)
    restored = ckpt_lib.restore_pytree(path, _params())
    np.testing.assert_allclose(
        restored["dense"]["kernel"], p["dense"]["kernel"],
        rtol=1e-2, atol=1e-2)


def test_archive_exact_in_f32(tmp_path):
    # opting out of the bf16 cast keeps float payloads bit-exact
    p = _params()
    path = str(tmp_path / "params_f32.msgpack")
    ckpt_lib.archive_params(path, p, cast_floats=np.float32)
    restored = ckpt_lib.restore_archive(path, _params())
    np.testing.assert_array_equal(restored["dense"]["kernel"],
                                  p["dense"]["kernel"])
