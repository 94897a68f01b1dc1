"""Codec engines: NBTC tiled (TPU-native), Q0.2 / NBLIC0.3 interop."""

import importlib

_SUBMODULES = ("tiled", "qnblic", "nblic")


def __getattr__(name):
    if name in _SUBMODULES:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
