"""Smoke the quality-tool chain against the committed trained fixture.

`tests/fixtures/csmsc_ae_r5.f16.ckpt` is a GENUINELY TRAINED full-size
CSMSC-shaped MSMC-VQ-GAN autoencoder (12k steps — 8k warmup + 4k GAN —
on the seeded synthetic corpus, `examples/csmsc/scripts/
synthetic_corpus.py`), stripped to inference essentials by
`tools/strip_checkpoint.py --f16` (params minus discriminator +
codebook + model_state, config embedded). It exists so the AS-MCD /
int8 A/B tool chain smokes after a /tmp wipe without the ~2 h
regeneration (VERDICT r4 next-#5): /tmp has been wiped by host swaps
twice, each time destroying the checkpoints behind committed numbers.

The corpus itself is seeded, so `synthetic_corpus.py --out X --n-utts
120 --n-valid 6` regenerates bit-identical eval inputs for
`tools/as_mcd_sweep.py` against this fixture.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "csmsc_ae_r5.f16.ckpt"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="trained fixture not present"
)


@pytest.fixture(scope="module")
def fixture_task():
    from msmctts_tpu.config import Config
    from msmctts_tpu.tasks import build_task
    from msmctts_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(FIXTURE)
    task = build_task(Config(ckpt["config"]), mode="infer")
    task.load_variables(ckpt["state"])
    return ckpt, task


def test_fixture_is_self_describing_and_trained(fixture_task):
    ckpt, _ = fixture_task
    assert ckpt["iteration"] >= 12000
    params = ckpt["state"]["params"]
    assert "discriminator" not in params  # stripped
    assert "autoencoder" in params
    # codebook EMA state survived the strip (the AS path snaps against it)
    assert "codebook" in ckpt["state"]


def test_fixture_analysis_synthesis_runs(fixture_task):
    """The exact load-and-decode path as_mcd_sweep.py / infer.py use."""
    _, task = fixture_task
    T = 64  # divides prod(downsample_scales)
    rng = np.random.default_rng(0)
    batch = {
        "mel": rng.normal(size=(1, T, 80)).astype(np.float32) * 0.5,
        "mel_length": np.array([T], np.int32),
    }
    out = task.analysis_synthesis(batch)
    wav = np.asarray(out["wav"][0])
    # CSMSC recipe: 24 kHz, 12.5 ms hop = 300 samples (config-embedded)
    frameshift = int(task.config.dataset["frameshift"][0])  # mel hop
    assert wav.shape[-1] == T * frameshift
    assert np.all(np.isfinite(wav))
    # a trained decoder emits bounded, non-degenerate audio
    assert 1e-4 < np.abs(wav).max() < 10.0
