"""Training-metric sinks: jsonl always, tensorboard/wandb when available.

Reference parity: the trainer logged train losses and eval ADE/FDE/WDE to
wandb from inside model.forward behind a deepspeed barrier
(handsonvlm.py:195-198, handsonvlm_trainer.py:302-306) and to tensorboard
via --report_to (finetune.sh:20). Here metrics arrive as step dicts from
the train loop (aux outputs, no collectives in forward) and fan out to:

- metrics.jsonl (always; the source of truth)
- torch.utils.tensorboard SummaryWriter, if importable (tb event files)
- wandb, if importable AND configured (WANDB_API_KEY/WANDB_MODE=offline)

Only process 0 writes (multi-host).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, out_dir: str, run_name: Optional[str] = None,
                 enable_tensorboard: bool = True, enable_wandb: bool = True):
        import jax

        self.is_main = jax.process_index() == 0
        self.jsonl = None
        self.tb = None
        self.wandb = None
        if not self.is_main:
            return
        os.makedirs(out_dir, exist_ok=True)
        self.jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        # run name derived from the output dir, like the reference
        # (handsonvlm/train/train.py:197-204)
        run_name = run_name or os.path.basename(os.path.abspath(out_dir))
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:  # noqa: BLE001 — optional sink
                self.tb = None
        if enable_wandb:
            try:
                import wandb

                if wandb.run is None and (
                    os.environ.get("WANDB_API_KEY") or os.environ.get("WANDB_MODE")
                ):
                    wandb.init(project=os.environ.get("WANDB_PROJECT", "handsonvlm_tpu"),
                               name=run_name, dir=out_dir)
                self.wandb = wandb if getattr(wandb, "run", None) else None
            except Exception:  # noqa: BLE001 — optional sink
                self.wandb = None

    def log(self, metrics: Dict, step: int) -> None:
        if not self.is_main:
            return
        rec = {k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()}
        rec["step"] = step
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in rec.items():
                if isinstance(v, (int, float)) and k != "step":
                    self.tb.add_scalar(k, v, step)
        if self.wandb is not None:
            self.wandb.log(rec, step=step)

    def close(self) -> None:
        if self.jsonl is not None:
            self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()
