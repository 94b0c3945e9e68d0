"""Service-mode YAML configuration (contract parity-of-intent).

The reference contract promises a config-file service mode
(HighVolumeExcelConverter-Contract-v2.0.1.md:252-267: run with
``-Dconfig.path=/etc/catmepim/converter.yml``; keys ``input``,
``output``, ``format``, ``batchSize``, ``sheetName``,
``continueOnError``) which the reference never implements
(SURVEY.md §2.5). Implemented here: the CLI's ``--config`` flag / the
``CATME_CONVERTER_CONFIG`` env var load that YAML; explicit CLI flags
override file values.

Keys are accepted in the contract's camelCase or this engine's
snake_case; unknown keys are an error (typos in service configs should
fail loudly, not be silently ignored).
"""

from __future__ import annotations

import os

from catme_etl_j_spark.converter.errors import ConversionError

ENV_VAR = "CATME_CONVERTER_CONFIG"

# contract camelCase -> convert() kwarg (snake_case identity pairs are
# accepted automatically)
_KEY_MAP = {
    "input": "input",
    "output": "output",
    "format": "format",
    "batchSize": "batch_size",
    "sheetName": "sheet_name",
    "sheetIndex": "sheet_index",
    "headerRow": "header_row",
    "continueOnError": "continue_on_error",
    "tempDir": "temp_dir",
    "overwrite": "overwrite",
    "prettyPrint": "pretty_print",
    "minInflateRatio": "min_inflate_ratio",
    "maxEntrySize": "max_entry_size",
    "strategyHint": "strategy_hint",
    "dateFormat": "date_format",
    "verbose": "verbose",
    "memThreshold": "mem_threshold",
}
_VALID_SNAKE = set(_KEY_MAP.values())


def load_config(path: str) -> dict:
    """Parse a converter.yml into ``convert()`` keyword arguments."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover - baked into this env
        raise ConversionError("PyYAML is required for --config mode") from e
    try:
        with open(path) as f:
            doc = yaml.safe_load(f)
    except OSError as e:
        raise ConversionError(f"cannot read config {path!r}: {e}") from e
    except yaml.YAMLError as e:
        raise ConversionError(f"invalid YAML in {path!r}: {e}") from e
    if doc is None:
        return {}
    if not isinstance(doc, dict):
        raise ConversionError(f"config {path!r} must be a mapping, got {type(doc).__name__}")
    out: dict = {}
    for key, value in doc.items():
        if key in _KEY_MAP:
            out[_KEY_MAP[key]] = value
        elif key in _VALID_SNAKE:
            out[key] = value
        else:
            raise ConversionError(
                f"unknown config key {key!r} in {path!r}; valid keys: "
                f"{sorted(_KEY_MAP)} (or their snake_case forms)"
            )
    return out


def default_config_path() -> str | None:
    """The env-var analog of the reference's ``-Dconfig.path``."""
    return os.environ.get(ENV_VAR) or None
