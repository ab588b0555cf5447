"""Layered YAML config (SURVEY §2 L4, §3.3).

Reproduces the reference's two-layer profile merge
(``common.py:22-30``: ``{**base_yaml, **profile_yaml}``) plus the
provenance dump of the resolved config next to the outputs.
Profiles are scale knobs (reference ``config/{quick_one,quick_all,full}.yaml``).
"""

from __future__ import annotations

import os
from typing import Any

import yaml


def load_config(config_dir: str, profile: str, base: str = "base") -> dict[str, Any]:
    """``base.yaml`` ⊕ ``<profile>.yaml`` — later layer wins per top-level key."""
    with open(os.path.join(config_dir, f"{base}.yaml")) as f:
        merged = yaml.safe_load(f) or {}
    with open(os.path.join(config_dir, f"{profile}.yaml")) as f:
        merged.update(yaml.safe_load(f) or {})
    return merged


def dump_provenance(config: dict[str, Any], output_dir: str) -> str:
    """Write the resolved config beside the outputs (``common.py:28-30``)."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "params.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(config, f)
    return path
