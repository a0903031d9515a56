"""Dataset-layer behavioral tests: books, testlists, segment cropping,
normalization, duration fixups, bucketing, zip members, loader sharding."""

import os
import zipfile

import numpy as np
import pytest
import yaml

from msmctts_tpu.data.datasets import (
    EmbDataset,
    MelDataset,
    TTSDataset,
    bucket_length,
    feature_normalize,
)
from msmctts_tpu.data.loader import DataLoader, finite_loader
from tests.tiny import FRAMESHIFT, MEL_DIM, write_tiny_dataset


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ds"))
    write_tiny_dataset(d, n_utts=8)
    return d


def _mel_kwargs(corpus, **over):
    kw = dict(
        id_list=f"{corpus}/train.list",
        samplerate=1600,
        feature=["mel", "wav"],
        feature_path=[f"{corpus}/mel/{{}}.npy", f"{corpus}/wav/{{}}.wav"],
        dimension=[MEL_DIM, 1],
        frameshift=[FRAMESHIFT, 1],
        padding_value=[-4, 0],
        training=True,
    )
    kw.update(over)
    return kw


def test_bucket_length_ladder():
    assert bucket_length(1, (64, 128)) == 64
    assert bucket_length(64, (64, 128)) == 64
    assert bucket_length(65, (64, 128)) == 128
    assert bucket_length(1000, (64, 128)) == 1024  # granularity past ladder


def test_mel_dataset_batches(corpus):
    ds = MelDataset(**_mel_kwargs(corpus))
    assert len(ds) == 3200  # MIN_DATASET_SIZE padding
    batch = ds.collate_fn([ds[i] for i in range(4)])
    B, T, D = batch["mel"].shape
    assert D == MEL_DIM and T in (64, 128)
    assert batch["wav"].shape == (B, T * FRAMESHIFT)
    np.testing.assert_array_equal(batch["wav_length"], batch["mel_length"] * FRAMESHIFT)
    # padding value applied
    i_short = int(np.argmin(batch["mel_length"]))
    assert np.allclose(batch["mel"][i_short, -1], -4)


def test_segment_cropping(corpus):
    ds = MelDataset(**_mel_kwargs(corpus, segment_length=4 * FRAMESHIFT))
    case = ds.parse_case(0)
    assert case["mel"].shape[0] <= 4
    assert case["wav"].shape[0] == case["mel"].shape[0] * FRAMESHIFT


def test_feature_stat_normalization(corpus, tmp_path):
    stat = {"method": "minmax", "min": [-3.0] * MEL_DIM, "max": [3.0] * MEL_DIM}
    stat_path = str(tmp_path / "mel_stat.yaml")
    with open(stat_path, "w") as f:
        yaml.safe_dump(stat, f)
    ds = MelDataset(**_mel_kwargs(corpus, feature_stat=[stat_path, None]))
    case = ds.parse_case(0)
    raw = np.load(f"{corpus}/mel/{ds.id_list[0][0]}.npy")
    expect = (raw - (-3.0)) / 6.0
    np.testing.assert_allclose(case["mel"], expect, rtol=1e-5)
    # round trip
    back = feature_normalize(case["mel"], ds.feature_stat["mel"], denormalize=True)
    np.testing.assert_allclose(back, raw, rtol=1e-4, atol=1e-5)


def test_tts_dataset_duration_fixup(corpus):
    ds = TTSDataset(
        id_list=f"{corpus}/train.list",
        samplerate=1600,
        feature=["text", "dur", "mel"],
        feature_path=[f"{corpus}/phone.txt", f"{corpus}/dur.txt", f"{corpus}/mel/{{}}.npy"],
        dimension=[2, 1, MEL_DIM],
        frameshift=[None, None, FRAMESHIFT],
        padding_value=[0, 0, -4],
        training=True,
    )
    case = ds.parse_case(0)
    assert case["text"].shape[1] == 2  # phone_tone pairs
    assert case["dur"].sum() == case["mel"].shape[0]  # forced consistency
    batch = ds.collate_fn([ds[i] for i in range(3)])
    assert batch["text"].dtype == np.int32
    assert batch["dur"].shape == batch["text"].shape[:2]


def test_testlist_yaml_inline_and_paths(corpus, tmp_path):
    tl = {
        "a": {"mel": f"{corpus}/mel/utt000.npy"},
        "b": {"text": "3_1 5_2 7_0"},
    }
    path = str(tmp_path / "tl.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(tl, f)
    # features must be declared in the dataset config (as in the reference,
    # where infer.py reuses the config's dataset/testset feature list)
    ds = MelDataset(
        **_mel_kwargs(
            corpus,
            id_list=path,
            training=False,
            feature=["mel", "text"],
            feature_path=[f"{corpus}/mel/{{}}.npy", None],
            dimension=[MEL_DIM, 2],
            frameshift=[FRAMESHIFT, None],
            padding_value=[-4, 0],
        )
    )
    assert len(ds) == 2
    a = ds.parse_case(0)
    assert a["mel"].shape[1] == MEL_DIM and a["_id"] == 0
    b = ds.parse_case(1)
    assert b["text"].shape == (3, 2)  # inline '_'-separated pairs


def test_zip_member_paths(corpus, tmp_path):
    zpath = str(tmp_path / "mels.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(f"{corpus}/mel/utt000.npy", "utt000.npy")
    ds = MelDataset(**_mel_kwargs(corpus))
    arr = ds.parse_file(f"{zpath}:utt000.npy")
    np.testing.assert_array_equal(arr, np.load(f"{corpus}/mel/utt000.npy"))


def test_loader_sharding_disjoint(corpus):
    ds = MelDataset(**_mel_kwargs(corpus))
    seen = []
    for rank in (0, 1):
        loader = DataLoader(
            ds, batch_size=4, num_workers=0, seed=7, shard=(rank, 2)
        )
        stream = loader._index_stream()
        seen.append(set(next(stream) + next(stream)))
    assert not (seen[0] & seen[1])  # ranks read disjoint indices


def test_loader_sharding_preserves_global_order(corpus):
    """Contiguous-block sharding: concatenating the rank shards of global
    step k reproduces the single-process batch k (same rows, same order) —
    the property that makes a 2-process run bit-identical to the 1-process
    run (per-row RNG such as GAN window starts pairs identically)."""
    ds = MelDataset(**_mel_kwargs(corpus))
    single = DataLoader(ds, batch_size=4, num_workers=0, seed=7)._index_stream()
    shards = [
        DataLoader(
            ds, batch_size=2, num_workers=0, seed=7, shard=(rank, 2)
        )._index_stream()
        for rank in (0, 1)
    ]
    for _ in range(3):
        expect = next(single)
        got = next(shards[0]) + next(shards[1])
        assert got == expect


def test_loader_deterministic(corpus):
    ds = MelDataset(**_mel_kwargs(corpus))
    def first_batches(workers):
        it = iter(DataLoader(ds, batch_size=4, num_workers=workers, seed=3))
        return [next(it)["mel_length"].tolist() for _ in range(3)]
    assert first_batches(0) == first_batches(2)  # threads preserve order


def test_emb_dataset(tmp_path_factory):
    from tests.tiny import write_tiny_emb_dataset

    d = str(tmp_path_factory.mktemp("emb_ds"))
    write_tiny_emb_dataset(d)
    ds = EmbDataset(
        id_list=f"{d}/train.list",
        samplerate=1600,
        feature=["emb", "pitch", "energy", "mel", "wav"],
        feature_path=[
            f"{d}/emb/{{}}.npy", f"{d}/pitch/{{}}.npy", f"{d}/energy/{{}}.npy",
            f"{d}/mel/{{}}.npy", f"{d}/wav/{{}}.wav",
        ],
        dimension=[12, 1, 1, MEL_DIM, 1],
        frameshift=[FRAMESHIFT] * 4 + [1],
        padding_value=[0, 0, 0, -4, 0],
        training=True,
    )
    batch = ds.collate_fn([ds[i] for i in range(4)])
    B, T, _ = batch["emb"].shape
    assert batch["pitch"].shape == (B, T, 1)
    assert batch["wav"].shape == (B, T * FRAMESHIFT)
    assert "emb_length" in batch
