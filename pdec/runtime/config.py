"""One typed config tree with dotted-path CLI overrides.

The reference layers four config mechanisms (SURVEY.md §5: bash sweep
variables, HfArgumentParser dataclasses, DeepSpeed JSON with "auto"
back-fill, per-tool argparse).  Here a single nested dataclass tree is the
source of truth; every run serializes its resolved config into the run
directory for reproducibility.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Sequence

from pdec.control.synthesis import SynthesisConfig
from pdec.train.dpo import DPOConfig
from pdec.train.optim import TrainConfig


@dataclasses.dataclass
class DataConfig:
    data_dir: str = "datasets/unprocessed/sft"
    prompt_format: str = "to_STL"
    max_len: int = 4096  # reference context length (run_training.sh:13)
    balance: Sequence[float] = (1.0,)
    total: Optional[int] = None
    seed: int = 3407  # reference shuffle seed (group_text.py:100)
    pack: bool = False
    pad: bool = False


@dataclasses.dataclass
class ModelSpec:
    preset: str = "deepseek_7b"  # key into pdec.models.config presets
    checkpoint: Optional[str] = None  # HF dir or orbax dir
    lora_rank: int = 64  # reference train.sh:97
    lora_alpha: float = 256.0
    lora_dropout: float = 0.1


@dataclasses.dataclass
class EvalConfig:
    data_dir: str = "datasets/test"
    prompt_format: str = "to_python_no_STL"
    few_shot_number: int = 0
    prompt_dataset: str = "combined"
    max_num_examples: int = 512
    eval_batch_size: int = 16
    temperature: float = 0.2  # infer_pdecontrol.sh:36
    seed: int = 0
    n_repeat_sampling: int = 3
    max_new_tokens: int = 1024
    eval_perplexity: bool = True
    eval_robustness: bool = True
    eval_edit_distance: bool = True
    eval_iou: bool = True


@dataclasses.dataclass
class RunConfig:
    run_dir: str = "runs/default"
    mode: str = "sft"  # sft | dpo | eval | simulate_gt | datagen
    model: ModelSpec = dataclasses.field(default_factory=ModelSpec)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    dpo: DPOConfig = dataclasses.field(default_factory=DPOConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    synthesis: SynthesisConfig = dataclasses.field(
        default_factory=SynthesisConfig
    )
    mesh_data: int = 1
    mesh_fsdp: int = -1
    mesh_tp: int = 1
    save_interval: int = 500  # persistent checkpoint-step-N cadence
    external_validation: bool = False


def _to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_dict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if hasattr(obj, "_asdict"):  # NamedTuple configs
        return {k: _to_dict(v) for k, v in obj._asdict().items()}
    if isinstance(obj, (list, tuple)):
        return [_to_dict(v) for v in obj]
    return obj


def _set_path(obj: Any, parts: Sequence[str], value: Any) -> Any:
    """Immutably set a dotted path through (frozen) dataclasses/NamedTuples."""
    name = parts[0]
    if not hasattr(obj, name):
        raise AttributeError(f"no config field {name!r} on {type(obj).__name__}")
    new_value = (
        value if len(parts) == 1
        else _set_path(getattr(obj, name), parts[1:], value)
    )
    if hasattr(obj, "_replace"):  # NamedTuple
        return obj._replace(**{name: new_value})
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return dataclasses.replace(obj, **{name: new_value})
    setattr(obj, name, new_value)
    return obj


def apply_overrides(cfg: RunConfig, overrides: Sequence[str]) -> RunConfig:
    """Apply ``a.b.c=value`` overrides (values parsed as JSON, falling back
    to string)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} is not key=value")
        path, raw = ov.split("=", 1)
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        cfg = _set_path(cfg, path.split("."), value)
    return cfg


def save_config(cfg: RunConfig, run_dir: Optional[str] = None) -> str:
    run_dir = run_dir or cfg.run_dir
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, "config.json")
    with open(path, "w") as f:
        json.dump(_to_dict(cfg), f, indent=2)
    return path


def load_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
