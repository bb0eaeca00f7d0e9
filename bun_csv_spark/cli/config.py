"""CLI config resolution: file discovery + env + flag precedence.

Reference: src/cli/config.ts:25-107 — config file found by walking up from
cwd to the filesystem root, then the home directory; merge precedence is
CLI args > environment variables > config file > defaults.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

CONFIG_FILENAMES = (".bcsvrc", ".bcsvrc.json", "bcsv.config.json")
ENV_PREFIX = "BCSV_"

DEFAULTS: dict[str, Any] = {
    "delimiter": "auto",
    # reference default is auto-detect (parser.ts:78-79)
    "encoding": "auto",
    "has_header": True,
    "format": "auto",
    "color": True,
}


def find_config_file(start_dir: str | None = None) -> str | None:
    current = Path(start_dir or os.getcwd()).resolve()
    while True:
        for name in CONFIG_FILENAMES:
            p = current / name
            if p.is_file():
                return str(p)
        if current.parent == current:
            break
        current = current.parent
    home = Path.home() / CONFIG_FILENAMES[0]
    if home.is_file():
        return str(home)
    return None


def load_config_file(path: str | None) -> dict[str, Any]:
    if not path:
        return {}
    try:
        return json.loads(Path(path).read_text())
    except (OSError, json.JSONDecodeError):
        return {}


def env_config(environ: dict[str, str] | None = None) -> dict[str, Any]:
    env = environ if environ is not None else os.environ
    out: dict[str, Any] = {}
    if v := env.get(f"{ENV_PREFIX}DELIMITER"):
        out["delimiter"] = v
    if v := env.get(f"{ENV_PREFIX}ENCODING"):
        out["encoding"] = v
    if v := env.get(f"{ENV_PREFIX}FORMAT"):
        out["format"] = v
    if env.get(f"{ENV_PREFIX}NO_HEADER") in ("1", "true"):
        out["has_header"] = False
    if env.get(f"{ENV_PREFIX}COLOR") in ("1", "true"):
        out["color"] = True
    if env.get("NO_COLOR") == "1" or env.get(f"{ENV_PREFIX}NO_COLOR") == "1":
        out["color"] = False
    return out


def merge_config(cli_args: dict[str, Any], start_dir: str | None = None) -> dict[str, Any]:
    """defaults < file < env < CLI (config.ts:75-107)."""
    merged = dict(DEFAULTS)
    merged.update(load_config_file(find_config_file(start_dir)))
    merged.update(env_config())
    merged.update({k: v for k, v in cli_args.items() if v is not None})
    return merged
