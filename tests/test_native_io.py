"""Native C++ IO core parity vs numpy/scipy readers."""

import os

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
    out, srs = native.read_batch(paths, kinds, n_threads=4)
    for o, r, k, sr in zip(out, refs, kinds, srs):
        np.testing.assert_allclose(o, r.astype(np.float32), atol=1e-6)
        assert sr == (8000 if k == 1 else 0)


def test_loader_uses_native_batch_path(rng, tmp_path):
    """DataLoader._make_batch routes through BaseDataset.parse_cases (one
    C++ thread-pool read per batch) and produces batches identical to the
    per-file python path."""
    from msmctts_tpu.data.datasets import MelDataset
    from msmctts_tpu.data.loader import DataLoader

    os.makedirs(tmp_path / "mel", exist_ok=True)
    os.makedirs(tmp_path / "wav", exist_ok=True)
    ids = []
    for i in range(6):
        uid = f"u{i:03d}"
        T = 24 + 4 * i
        mel = rng.normal(size=(T, 8)).astype(np.float32)
        wav = (rng.normal(size=T * 4) * 0.2).astype(np.float32)
        np.save(str(tmp_path / "mel" / f"{uid}.npy"), mel)
        save_wav(str(tmp_path / "wav" / f"{uid}.wav"), wav, 16000)
        ids.append(uid)
    listfile = str(tmp_path / "train.list")
    with open(listfile, "w") as f:
        f.write("\n".join(ids) + "\n")

    def make_ds():
        return MelDataset(
            id_list=listfile,
            feature=["mel", "wav"],
            samplerate=16000,
            dimension=[8, 1],
            frameshift=[4, 1],
            feature_path=[
                str(tmp_path / "mel" / "{}.npy"),
                str(tmp_path / "wav" / "{}.wav"),
            ],
            padding_value=[0, 0],
            seed=7,
        )

    ds = make_ds()
    assert native.native_available()
    chunk = [0, 1, 2]
    native_cases = ds.parse_cases(chunk)
    python_cases = [ds.parse_case(i, preloaded=None) for i in chunk]
    for a, b in zip(native_cases, python_cases):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)

    loader = DataLoader(make_ds(), batch_size=3, num_workers=2, seed=7)
    batch = next(iter(loader))
    assert batch["mel"].shape[0] == 3 and batch["wav"].shape[0] == 3


def test_read_npy_fortran_order(rng, tmp_path):
    """Fortran-ordered 2-D .npy (e.g. transposed mel extractor output) is
    transposed on load, matching np.load (reference utils.py supports
    Fortran order too)."""
    arr = np.asfortranarray(rng.normal(size=(17, 5)).astype(np.float32))
    p = str(tmp_path / "f.npy")
    np.save(p, arr)
    out = native.read_npy(p)
    np.testing.assert_allclose(out, arr, atol=0)
    # batch path too
    outs, _ = native.read_batch([p], [0])
    np.testing.assert_allclose(outs[0], arr, atol=0)
