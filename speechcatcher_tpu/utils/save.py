"""Native checkpoint save/restore (orbax) — the reference only loads
(SURVEY §5.4); saving completes the training loop added in training.py."""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

from speechcatcher_tpu.config import ModelConfig


def save_checkpoint(path: Path, params: Dict[str, Any], cfg: ModelConfig,
                    step: int = 0) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / f"params_{step}", params, force=True)
    meta = {"step": step, "config": dataclasses.asdict(cfg)}
    (path / "config.json").write_text(json.dumps(meta, indent=2))


def load_checkpoint(path: Path, step: Optional[int] = None
                    ) -> Tuple[Dict[str, Any], ModelConfig, int]:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    meta = json.loads((path / "config.json").read_text())
    cfg = ModelConfig(**meta["config"])
    if step is None:
        steps = sorted(
            int(p.name.split("_")[1])
            for p in path.glob("params_*")
            if p.name.split("_")[1].isdigit()
        )
        step = steps[-1]
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(path / f"params_{step}")
    return params, cfg, step
