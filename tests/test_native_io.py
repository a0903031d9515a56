"""Native C++ IO core parity vs numpy/scipy readers."""

import numpy as np
import pytest

from msmctts_tpu.data import native
from msmctts_tpu.data.datasets import load_wav, save_wav

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native lib unavailable"
)


def test_read_npy_roundtrip(rng, tmp_path):
    for dtype in (np.float32, np.float64, np.int32, np.int64):
        arr = (rng.normal(size=(17, 9)) * 10).astype(dtype)
        p = str(tmp_path / f"a_{np.dtype(dtype).name}.npy")
        np.save(p, arr)
        out = native.read_npy(p)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, arr.astype(np.float32), rtol=1e-6)


def test_read_npy_row_slice(rng, tmp_path):
    arr = rng.normal(size=(50, 8)).astype(np.float32)
    p = str(tmp_path / "b.npy")
    np.save(p, arr)
    out = native.read_npy(p, row_start=10, row_count=5)
    np.testing.assert_array_equal(out, arr[10:15])
    out = native.read_npy(p, row_start=45, row_count=-1)
    np.testing.assert_array_equal(out, arr[45:])


def test_read_npy_1d(rng, tmp_path):
    arr = rng.normal(size=(33,)).astype(np.float32)
    p = str(tmp_path / "c.npy")
    np.save(p, arr)
    np.testing.assert_array_equal(native.read_npy(p), arr)


def test_read_wav_matches_scipy(rng, tmp_path):
    wav = (rng.normal(size=4000) * 0.3).astype(np.float32)
    p = str(tmp_path / "x.wav")
    save_wav(p, wav, 16000)
    out, sr = native.read_wav(p)
    assert sr == 16000
    ref = load_wav(p)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_read_batch_parallel(rng, tmp_path):
    paths, kinds, refs = [], [], []
    for i in range(12):
        if i % 2 == 0:
            arr = rng.normal(size=(20 + i, 4)).astype(np.float32)
            p = str(tmp_path / f"f{i}.npy")
            np.save(p, arr)
            kinds.append(0)
            refs.append(arr)
        else:
            wav = (rng.normal(size=1000 + i) * 0.2).astype(np.float32)
            p = str(tmp_path / f"f{i}.wav")
            save_wav(p, wav, 8000)
            kinds.append(1)
            refs.append(load_wav(p))
        paths.append(p)
    out = native.read_batch(paths, kinds, n_threads=4)
    for o, r in zip(out, refs):
        np.testing.assert_allclose(o, r.astype(np.float32), atol=1e-6)
