"""YAML config loading — the PLR2-style orchestration surface (SURVEY.md
section 2 #17): experiments described as YAML files mapping onto the typed
dataclass config tree, with preset inheritance.

Schema:
    preset: ycb_refine          # optional base preset
    dataset: {num_points: 1000, root: /data/ycb}
    model:   {dtype: bfloat16}
    train:   {lr: 1.0e-4, nepoch: 500}
    eval_refine_iterations: 2
    data_parallel: 1
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

from plr2_tpu.config import PipelineConfig, get_preset


def _replace_section(obj, overrides: Dict[str, Any]):
    valid = {f.name for f in dataclasses.fields(obj)}
    unknown = set(overrides) - valid
    if unknown:
        raise KeyError(f"unknown {type(obj).__name__} fields: {sorted(unknown)}")
    coerced = {}
    for k, v in overrides.items():
        if isinstance(v, list):
            v = tuple(v)
        coerced[k] = v
    return dataclasses.replace(obj, **coerced)


def config_from_dict(doc: Dict[str, Any]) -> PipelineConfig:
    doc = dict(doc or {})
    preset = doc.pop("preset", None)
    cfg = get_preset(preset) if preset else PipelineConfig()

    sections = {}
    if "dataset" in doc:
        sections["dataset"] = _replace_section(cfg.dataset, doc.pop("dataset"))
    if "model" in doc:
        sections["model"] = _replace_section(cfg.model, doc.pop("model"))
    if "train" in doc:
        sections["train"] = _replace_section(cfg.train, doc.pop("train"))

    top_valid = {f.name for f in dataclasses.fields(cfg)}
    unknown = set(doc) - top_valid
    if unknown:
        raise KeyError(f"unknown config keys: {sorted(unknown)}")
    return dataclasses.replace(cfg, **sections, **doc)


def load_config(path: str) -> PipelineConfig:
    import yaml

    with open(path) as f:
        return config_from_dict(yaml.safe_load(f))


def save_config(cfg: PipelineConfig, path: str) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
