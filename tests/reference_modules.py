"""Import the reference torch modules from /root/reference for golden
parity tests — WITHOUT executing the reference package __init__ files,
which are broken at v2 HEAD (vqgantts/__init__.py imports the missing
msmc_vqgan_emb deps; SURVEY.md §2.3).

Package stubs are registered in sys.modules with only a search path, so
``import msmctts.networks.vqgantts.modules`` executes just that file.
Third-party modules the reference imports but never uses in these tests
(turtle via the stray msmc_vqgan.py:1 import, soundfile in utils.py:2)
are stubbed.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import importlib.util
import sys
import types

REF = "/root/reference"


def _pkg_stub(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.machinery.ModuleSpec(name, None, is_package=True)
    spec.submodule_search_locations = [path]
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    return mod


def _install_stft_compat():
    """The reference calls ``torch.stft`` without ``return_complex`` and
    indexes the old real-view layout (utils/audio.py:399-402); current torch
    makes that an error. Shim ONLY that omitted-parameter case back to the
    old behavior — explicit return_complex calls pass through untouched."""
    import torch

    if getattr(torch.stft, "_msmctts_compat", False):
        return
    _orig = torch.stft

    def stft(input, *args, **kwargs):
        if "return_complex" not in kwargs and not torch.is_complex(input):
            kwargs["return_complex"] = True
            return torch.view_as_real(_orig(input, *args, **kwargs))
        return _orig(input, *args, **kwargs)

    stft._msmctts_compat = True
    torch.stft = stft


def load_reference():
    """Returns a namespace with the reference torch module classes."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name, rel in [
        ("msmctts", "msmctts"),
        ("msmctts.networks", "msmctts/networks"),
        ("msmctts.networks.vqgantts", "msmctts/networks/vqgantts"),
        ("msmctts.networks.acoustic_models", "msmctts/networks/acoustic_models"),
        ("msmctts.networks.hifigan", "msmctts/networks/hifigan"),
        ("msmctts.utils", "msmctts/utils"),
    ]:
        _pkg_stub(name, f"{REF}/{rel}")
    sys.modules.setdefault("turtle", types.SimpleNamespace(update=None))
    if "soundfile" not in sys.modules:
        sf_stub = types.ModuleType("soundfile")
        sf_stub.SoundFile = object
        sys.modules["soundfile"] = sf_stub
    _install_stft_compat()
    if "librosa" not in sys.modules:
        # utils/audio.py imports librosa at module scope but the classes
        # these tests exercise (MelScale, TorchSTFT) never call it
        lb = types.ModuleType("librosa")
        lb_util = types.ModuleType("librosa.util")
        for fn in ("pad_center", "tiny", "normalize"):
            setattr(lb_util, fn, None)
        lb.util = lb_util
        sys.modules["librosa"] = lb
        sys.modules["librosa.util"] = lb_util

    modules = importlib.import_module("msmctts.networks.vqgantts.modules")
    generator = importlib.import_module("msmctts.networks.hifigan.generator")
    transformer = importlib.import_module(
        "msmctts.networks.acoustic_models.transformer"
    )
    # msmc_vqgan.py does `from msmctts.networks.hifigan import HifiGANGenerator`
    # — the package __init__ normally provides that alias (hifigan/__init__.py:1)
    sys.modules["msmctts.networks.hifigan"].HifiGANGenerator = generator.Generator
    msmc_vqgan = importlib.import_module("msmctts.networks.vqgantts.msmc_vqgan")
    predictor = importlib.import_module(
        "msmctts.networks.acoustic_models.multi_stage_predictor"
    )
    discriminator = importlib.import_module(
        "msmctts.networks.hifigan.discriminator"
    )
    return types.SimpleNamespace(
        Quantize=modules.Quantize,
        MultiHeadQuantize=modules.MultiHeadQuantize,
        ResStack=modules.ResStack,
        Generator=generator.Generator,
        FFTBlocks=transformer.FFTBlocks,
        LengthRegulator=transformer.LengthRegulator,
        DurationPredictor=transformer.DurationPredictor,
        MSMCVQGAN=msmc_vqgan.MSMCVQGAN,
        MultiStageQuantizer=msmc_vqgan.MultiStageQuantizer,
        PriorPredictor=msmc_vqgan.PriorPredictor,
        MultiStagePredictor=predictor.MultiStagePredictor,
        DiscriminatorR=discriminator.DiscriminatorR,
        MultiResolutionDiscriminator=discriminator.MultiResolutionDiscriminator,
        DiscriminatorP=discriminator.DiscriminatorP,
        MultiPeriodDiscriminator=discriminator.MultiPeriodDiscriminator,
        Discriminator=discriminator.Discriminator,
    )
