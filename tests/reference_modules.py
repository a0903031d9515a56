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
    )
