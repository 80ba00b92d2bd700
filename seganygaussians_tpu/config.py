"""Reflection-based CLI flag groups + persisted config.

Parity: `arguments/__init__.py` (149 LoC).  ``ParamGroup`` turns dataclass
fields into argparse flags (leading-underscore fields get a one-letter
shorthand, bools become store_true).  The reference persists the merged
Namespace as ``cfg_args`` via ``repr`` and reloads it with ``eval()``
(`arguments/__init__.py:115-149`) — here configs serialise as JSON
(``cfg_args.json``) with an eval()-free reader that still accepts the
reference's legacy ``Namespace(...)`` format for interop.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Any, Optional

from seganygaussians_tpu.models.gaussians import TrainHyper
from seganygaussians_tpu.scene import ModelConfig
from seganygaussians_tpu.train.contrastive_trainer import ContrastiveHyper

_SHORTHANDS = {
    "source_path": "s",
    "model_path": "m",
    "feature_model_path": "f",
    "images": "i",
    "resolution": "r",
    "white_background": "w",
}


@dataclasses.dataclass
class PipelineConfig:
    """`arguments/__init__.py:72-77` — kept for CLI surface parity; the
    convert_SHs/compute_cov3D python toggles are no-ops in the fused TPU
    rasterizer (SH eval and cov3D already run 'in python'/XLA)."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


def add_group(parser: argparse.ArgumentParser, dc_type, title: str) -> None:
    group = parser.add_argument_group(title)
    for f in dataclasses.fields(dc_type):
        name = f.name
        default = f.default
        flags = [f"--{name}"]
        if name in _SHORTHANDS:
            flags.append(f"-{_SHORTHANDS[name]}")
        if f.type in ("bool", bool):
            group.add_argument(*flags, action="store_true", default=default)
        else:
            typ = type(default) if default is not None else str
            group.add_argument(*flags, type=typ, default=default)


def extract(dc_type, args: argparse.Namespace):
    names = {f.name for f in dataclasses.fields(dc_type)}
    return dc_type(**{k: v for k, v in vars(args).items() if k in names})


def save_cfg(model_path: str, cfgs: dict[str, Any], name: str = "cfg_args") -> None:
    """Persist configs (train_scene writes `cfg_args`,
    `train_scene.py:156-157`; per-target files `seg_cfg_args`,
    `feature_cfg_args` like `arguments/__init__.py:120-126`)."""
    os.makedirs(model_path, exist_ok=True)
    payload = {
        k: dataclasses.asdict(v) if dataclasses.is_dataclass(v) else v
        for k, v in cfgs.items()
    }
    with open(os.path.join(model_path, name + ".json"), "w") as f:
        json.dump(payload, f, indent=1)


def load_cfg(model_path: str, name: str = "cfg_args") -> Optional[dict]:
    """Load a persisted config; accepts our JSON or the reference's
    ``Namespace(k=v, ...)`` repr (parsed without eval)."""
    json_path = os.path.join(model_path, name + ".json")
    if os.path.exists(json_path):
        with open(json_path) as f:
            return json.load(f)
    ref_path = os.path.join(model_path, name)
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            text = f.read().strip()
        if text.startswith("Namespace(") and text.endswith(")"):
            import ast

            # parse as a call expression, reading only literal kwargs
            node = ast.parse(text.replace("Namespace", "dict", 1), mode="eval")
            out = {}
            for kw in node.body.keywords:
                try:
                    out[kw.arg] = ast.literal_eval(kw.value)
                except (ValueError, SyntaxError):
                    pass
            return {"model": out}
    return None


def make_parser(description: str = "") -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    add_group(parser, ModelConfig, "Loading Parameters")
    add_group(parser, PipelineConfig, "Pipeline Parameters")
    add_group(parser, TrainHyper, "Optimization Parameters")
    return parser


def make_contrastive_parser(description: str = "") -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    add_group(parser, ModelConfig, "Loading Parameters")
    add_group(parser, PipelineConfig, "Pipeline Parameters")
    add_group(parser, ContrastiveHyper, "Optimization Parameters")
    return parser
