"""Multi-host utilities: initialization and eval-metric gathering.

Replaces the reference's distributed plumbing (SURVEY §2.5): DeepSpeed
launcher -> `jax.distributed.initialize()`; `accelerator.gather` of eval
tensors (handsonvlm_trainer.py:241-251) -> `process_allgather`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Single-controller multi-host init. No-ops when single-process (the
    common dev path) or when already initialized; on TPU pods the arguments
    come from the environment automatically."""
    # NB: do NOT probe jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize() refuses to run
    # (caught by tests/test_multihost_procs.py).
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:  # older JAX: fall back to the client state
        from jax._src import distributed as _dist

        already = getattr(_dist.global_state, "client", None) is not None
    if already:
        return
    env_says_multihost = any(
        k in os.environ for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS")
    )
    if coordinator_address or num_processes or env_says_multihost:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def gather_metrics(tree: Any) -> Any:
    """All-gather host-local metric arrays across processes (eval gather).

    Single-process: identity on numpy-converted leaves. Multi-process:
    `multihost_utils.process_allgather` concatenates along axis 0.
    """
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: np.asarray(multihost_utils.process_allgather(x)), tree
    )


def is_main_process() -> bool:
    return jax.process_index() == 0
