"""LoRA adapter registry for serving: hot-swap adapters between requests.

The reference serves one merged checkpoint per worker (LoRA weights are
folded into the base at load, handsonvlm/model/builder.py:37-87), so
switching adapters means restarting the worker. Here the decoder applies
LoRA as a runtime low-rank activation path (models/lora.py:60-65,
models/llama.py:163-213), so one resident base model can serve many
adapters: per request we hand the sampler ``{**base_params, "lora": tree}``
— no weight merging, no model reload.

Layout: ``lora_dir/<adapter_name>/`` each holding a ``lora`` artifact (as
saved by train.py --lora-r) and optionally ``non_lora_trainables`` (small
non-LoRA trainables such as the mm projector) which are overlaid onto the
base params dict by top-level key.

Device-memory notes (this tunnel; see CLAUDE.md):
- Freed Python-level device buffers never return to the allocator pool, so
  evicting an adapter does NOT reclaim its HBM. The LRU cap bounds how many
  distinct adapters ever go resident; same-shaped swaps can reuse pooled
  chunks, so keep all adapters at one (r, targets) geometry.
- A jitted program is specialized on lora presence + shapes; adapters with
  the same geometry share one compiled decode program, so swapping costs a
  host->device transfer the first time and nothing after.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple


class LoraRegistry:
    def __init__(self, lora_dir: str, max_resident: int = 4, cast=None):
        from handsonvlm_tpu.core.checkpoint import has_artifact

        self.lora_dir = lora_dir
        self.max_resident = max_resident
        self.cast = cast  # e.g. jnp.bfloat16 to match the decode dtype
        self._lock = threading.Lock()
        self._resident: "OrderedDict[str, Tuple[dict, dict]]" = OrderedDict()
        self.names: List[str] = sorted(
            d
            for d in (os.listdir(lora_dir) if os.path.isdir(lora_dir) else [])
            if has_artifact(os.path.join(lora_dir, d), "lora")
        )
        self.evictions = 0

    def __contains__(self, name: str) -> bool:
        return name in self.names

    def _load(self, name: str) -> Tuple[dict, dict]:
        import jax
        import jax.tree_util as jtu

        from handsonvlm_tpu.core.checkpoint import has_artifact, restore_artifact

        path = os.path.join(self.lora_dir, name)
        lora = restore_artifact(path, "lora")
        extra = (
            restore_artifact(path, "non_lora_trainables")
            if has_artifact(path, "non_lora_trainables")
            else {}
        )
        if self.cast is not None:
            cast = self.cast

            def _c(x):
                import jax.numpy as jnp

                arr = jnp.asarray(x)
                return arr.astype(cast) if jnp.issubdtype(arr.dtype, jnp.floating) else arr

            # keep the () scale in f32 — it multiplies an f32 accumulation
            adapters = jtu.tree_map(_c, lora["adapters"])
            lora = {"adapters": adapters, "scale": lora["scale"]}
            extra = jtu.tree_map(_c, extra)
        return jax.device_put((lora, extra))

    def get(self, name: str) -> Tuple[dict, dict]:
        """Return (lora_tree, extra_top_level_params), device-resident.
        LRU-caches up to max_resident adapters."""
        if name not in self.names:
            raise KeyError(f"unknown adapter {name!r}; have {self.names}")
        with self._lock:
            if name in self._resident:
                self._resident.move_to_end(name)
                return self._resident[name]
        loaded = self._load(name)  # load outside the lock; loads can be slow
        with self._lock:
            if name not in self._resident:
                self._resident[name] = loaded
                if len(self._resident) > self.max_resident:
                    self._resident.popitem(last=False)
                    self.evictions += 1
            self._resident.move_to_end(name)
            return self._resident[name]

    def params_for(self, base_params: dict, name: Optional[str]) -> Dict:
        """Per-request params: base dict + adapter lora + small overlays.
        ``name`` None/''/'base' selects the unadapted base model."""
        if not name or name == "base":
            return base_params
        lora, extra = self.get(name)
        out = dict(base_params)
        out["lora"] = lora
        out.update(extra)
        return out
