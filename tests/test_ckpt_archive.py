"""Durable params-only checkpoint archives (train/checkpoint.py).

Orbax run checkpoints are gitignored, so trained weights only survive a
fresh clone if the flagship params are archived to a committable
single-file snapshot. Round 3 lost the roach_bc3/bc4 experts and the
evaluated student checkpoint exactly this way — these tests pin the
archive/restore roundtrip (default = bit-exact, dtype-preserving; the
optional bf16 cast; and the restore_pytree dispatch) so the recovery
path stays sound.
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


def test_archive_roundtrip_is_bit_exact_by_default(tmp_path):
    # default (no cast): every leaf keeps its dtype, floats are bit-exact —
    # the archive reproduces the evaluated weights (ADVICE r3: the old bf16
    # default was lossy for f32-computing modules)
    p = _params()
    path = str(tmp_path / "params.msgpack")
    ckpt_lib.archive_params(path, p)
    restored = ckpt_lib.restore_archive(path, _params())
    assert restored["dense"]["kernel"].dtype == np.float32
    assert restored["step_like"].dtype == np.int32
    np.testing.assert_array_equal(restored["dense"]["kernel"],
                                  p["dense"]["kernel"])
    assert int(restored["step_like"]) == 7
    np.testing.assert_array_equal(restored["dense"]["bias"],
                                  p["dense"]["bias"])


def test_restore_pytree_dispatches_msgpack(tmp_path):
    p = _params()
    path = str(tmp_path / "params.msgpack")
    ckpt_lib.archive_params(path, p)
    restored = ckpt_lib.restore_pytree(path, _params())
    np.testing.assert_array_equal(restored["dense"]["kernel"],
                                  p["dense"]["kernel"])


def test_archive_bf16_cast_opt_in(tmp_path):
    # an explicit bf16 cast still works for knowingly-lossy small archives
    p = _params()
    path = str(tmp_path / "params_bf16.msgpack")
    ckpt_lib.archive_params(path, p, cast_floats=jnp.bfloat16)
    restored = ckpt_lib.restore_archive(path, _params())
    assert restored["dense"]["kernel"].dtype == np.float32  # template dtype
    np.testing.assert_allclose(
        restored["dense"]["kernel"], p["dense"]["kernel"],
        rtol=1e-2, atol=1e-2)
    # the archive is genuinely smaller than the exact one
    exact = str(tmp_path / "params_exact.msgpack")
    ckpt_lib.archive_params(exact, p)
    import os
    assert os.path.getsize(path) < os.path.getsize(exact)


def test_archive_cast_covers_extension_float_dtypes(tmp_path):
    # ADVICE r3 (low): np.issubdtype misses ml_dtypes bfloat16 — an explicit
    # f32 upcast must also lift bf16-native leaves
    p = _params()
    path = str(tmp_path / "params_f32.msgpack")
    ckpt_lib.archive_params(path, p, cast_floats=np.float32)
    from flax import serialization
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    assert raw["bf16_native"].dtype == np.float32
