"""YAML configuration system.

Parity surface: composer/config.py:8-72 — multi-document YAML merged into an
attribute-accessible dict, with the originating filepath retained so the CLI
can snapshot the config next to checkpoints and preprocessed datasets.

The schema is identical to the reference default_config.yml:1-48.
"""

from __future__ import annotations

import io
from pathlib import Path

import yaml


class Dotdict(dict):
    """A dict whose items are also reachable as attributes (recursively)."""

    def __init__(self, data=None):
        super().__init__()
        for key, value in (data or {}).items():
            if isinstance(value, dict):
                value = Dotdict(value)
            self[key] = value

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as exc:  # AttributeError keeps hasattr() semantics sane
            raise AttributeError(name) from exc

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


class ConfigInstance(Dotdict):
    """A loaded configuration plus the path it was loaded from.

    ``filepath`` is stored as an attribute on the *instance* (not a dict key)
    so that iterating config sections never trips over it.
    """

    def __init__(self, filepath, data):
        super().__init__(data)
        object.__setattr__(self, "_filepath", str(filepath) if filepath is not None else None)

    @property
    def filepath(self):
        return self._filepath


def loads(source: str, filepath=None) -> ConfigInstance:
    """Parses a (possibly multi-document) YAML string into a ConfigInstance."""
    merged = {}
    for document in yaml.safe_load_all(io.StringIO(source)):
        if document is None:
            continue
        merged.update(document)
    return ConfigInstance(filepath, merged)


def get(filepath) -> ConfigInstance:
    """Loads a configuration file. Multi-document YAML files are merged top-down."""
    filepath = Path(filepath)
    return loads(filepath.read_text(), filepath)


def get_default_config_path() -> Path:
    """Path of the packaged default configuration."""
    return Path(__file__).parent / "default_config.yml"


def get_default() -> ConfigInstance:
    return get(get_default_config_path())
