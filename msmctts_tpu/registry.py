"""Explicit component registries.

The reference resolves ``_name:`` strings by globbing every ``*.py`` file in a
layer directory and importing all of them (``msmctts/utils/utils.py:276-316``)
— one broken file poisons the whole layer (SURVEY.md 2.3). Here every
component registers itself explicitly at import time and lookup is a dict
get, with the same YAML-facing contract: a config node's ``_name`` picks the
class, the node's non-underscore keys are its kwargs.
"""

from __future__ import annotations

NETWORKS: dict = {}
TASKS: dict = {}
TRAINERS: dict = {}
DATASETS: dict = {}


def _make_register(table: dict, kind: str):
    def register(name: str):
        def wrap(cls):
            if name in table:
                raise ValueError(f"duplicate {kind} registration: {name}")
            table[name] = cls
            return cls

        return wrap

    return register


register_network = _make_register(NETWORKS, "network")
register_task = _make_register(TASKS, "task")
register_trainer = _make_register(TRAINERS, "trainer")
register_dataset = _make_register(DATASETS, "dataset")


def _resolve(table: dict, name: str, kind: str):
    # Import the modules that populate the registries lazily to avoid
    # circular imports at package-init time. Re-run on any miss, not just
    # on an empty table: a user importing one component module directly
    # (e.g. models.predictor) part-fills the table, which must not
    # suppress registration of the rest.
    if name not in table:
        _populate()
    if name not in table:
        known = ", ".join(sorted(table))
        raise KeyError(f"unknown {kind} '{name}' (known: {known})")
    return table[name]


def _populate():
    # Importing these modules runs their @register_* decorators.
    from msmctts_tpu import tasks as _tasks  # noqa: F401
    from msmctts_tpu.data import datasets as _datasets  # noqa: F401
    from msmctts_tpu.models import (  # noqa: F401
        hifigan as _hifigan,
        msmc_vqgan as _msmc_vqgan,
        msmc_vqgan_emb as _msmc_vqgan_emb,
        predictor as _predictor,
    )
    from msmctts_tpu.training import (  # noqa: F401
        emb_vqgan_trainer as _etr,
        predictor_trainer as _ptr,
        vqgan_trainer as _vtr,
    )


def get_network(name: str):
    return _resolve(NETWORKS, name, "network")


def get_task(name: str):
    return _resolve(TASKS, name, "task")


def get_trainer(name: str):
    return _resolve(TRAINERS, name, "trainer")


def get_dataset(name: str):
    return _resolve(DATASETS, name, "dataset")
