"""Config source (SURVEY.md A8): YAML file + environment override.

Mirrors the reference's viper setup (/root/reference/config/config.go:14-34)
and the precedence its only test pins (config_test.go:11-21): an
ARIADNA_<KEY> environment variable overrides the YAML file value, which
overrides the built-in default. CLI flags, when a script exposes them,
sit above all three (viper's flag binding).

Values are coerced to the type of the corresponding default, so
`ARIADNA_N_BUCKETS=32` arrives as int 32 — the same convenience viper's
GetInt provides.
"""

from __future__ import annotations

import os

DEFAULTS: dict = {
    "index_name": "ariadna",
    "docs_path": "",
    "out_dir": "",
    "build_id": "b0",
    "n_buckets": 16,
    "n_salts": 16,
    "block_size": 128,
    "k": 10,
    "publish": True,
}

ENV_PREFIX = "ARIADNA_"


def _coerce(value, like):
    if like is None:
        return value
    if isinstance(like, bool):  # before int: bool is an int subclass
        return str(value).strip().lower() in ("1", "true", "yes", "on")
    if isinstance(like, int):
        return int(value)
    if isinstance(like, float):
        return float(value)
    return str(value)


def load_config(
    path: str | None = None,
    env: dict | None = None,
    defaults: dict | None = None,
) -> dict:
    """defaults <- YAML file <- ARIADNA_* env vars (highest)."""
    import yaml

    base = dict(DEFAULTS if defaults is None else defaults)
    cfg = dict(base)
    if path:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        if not isinstance(data, dict):
            raise ValueError(f"config file {path} must be a YAML mapping")
        for k, v in data.items():
            cfg[k] = _coerce(v, base.get(k))
    env = os.environ if env is None else env
    for k in sorted(set(base) | set(cfg)):
        ev = env.get(ENV_PREFIX + k.upper())
        if ev is not None:
            cfg[k] = _coerce(ev, base.get(k))
    return cfg


def resolve(args_value, cfg: dict, key: str):
    """CLI flag (if explicitly set) beats config; else config value."""
    return args_value if args_value is not None else cfg.get(key)
