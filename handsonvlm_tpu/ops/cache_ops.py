"""In-place block-aligned KV-cache defragmentation (Pallas DMA gather).

Continuous batching (serve/continuous.py) fragments the shared cache: every
join burns a prompt-bucket hole into every OTHER row's plane, and the shared
cursor only resets when all slots idle. This kernel moves each row's valid
cache blocks toward the front so the cursor can be pulled back — the
paged-attention-style defrag the TPU design needs because its cache is one
dense (L, B, S, K, D) array, not an indirection table.

The move granularity is the DECODE KERNEL'S block (ops.decode_attention
block_k): the engine computes per-row destination tables that keep every
valid key's lane-within-block and the relative order of valid blocks
(serve/continuous.ContinuousEngine.compact). The decode kernel's compacted
block sweep then sees bit-identical per-block inputs in identical order, so
a row's logits are BIT-EQUAL across a compaction event
(tests/test_continuous_compact.py).

In-place safety: destination tables are LEFT-MOVING (table[b, j] >= j). The
TPU grid executes sequentially in ascending (l, b, j) order, so the write at
destination block j can only land on blocks already consumed as sources
(src >= dest for every later step of the same (l, b) plane; other planes
are disjoint). The cache buffer is aliased input->output (plus jit donation
in the engine) — no second 6 GB cache is ever allocated, which also matters
because freed device buffers never return to the allocator on this backend
(CLAUDE.md).

Reference parity note: no counterpart exists — the reference serves one
request per generate call (llava/serve/model_worker.py:45-282) and never
shares a cache across requests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:  # pragma: no cover
        return True


def _copy_kernel(s_ref, c_ref, o_ref):
    del s_ref
    o_ref[...] = c_ref[...]


@functools.partial(jax.jit, static_argnames=("block_k", "seq_axis"),
                   donate_argnums=(0,))
def gather_cache_blocks(c, table, *, block_k: int, seq_axis: int = 2):
    """Move cache blocks per a left-moving per-row block table, in place.

    c:      (L, B, S, K, D) cache plane  (seq_axis=2; k/v, any dtype), or
            (L, B, K, S) scale plane     (seq_axis=3; int8-KV ks/vs).
    table:  (B, S // block_k) int32 — for every destination block j of row
            b, the SOURCE block index; identity entries (table[b, j] == j)
            are self-copies. Every entry must satisfy table[b, j] >= j.

    Returns the same buffer with, for every (b, j):
      out[:, b, j*bk:(j+1)*bk] = c[:, b, table[b, j]*bk : +bk]   (seq_axis 2)
    """
    ell, b = c.shape[0], c.shape[1]
    s = c.shape[seq_axis]
    nk = s // block_k
    assert table.shape == (b, nk), (table.shape, (b, nk))
    scalars = table.reshape(-1).astype(jnp.int32)

    if seq_axis == 2:
        _, _, _, kh, d = c.shape
        block = (1, 1, block_k, kh, d)
        in_map = lambda l, b_, j, sref: (l, b_, sref[b_ * nk + j], 0, 0)
        out_map = lambda l, b_, j, sref: (l, b_, j, 0, 0)
    elif seq_axis == 3:
        _, _, kh, _ = c.shape
        block = (1, 1, kh, block_k)
        in_map = lambda l, b_, j, sref: (l, b_, 0, sref[b_ * nk + j])
        out_map = lambda l, b_, j, sref: (l, b_, 0, j)
    else:  # pragma: no cover
        raise ValueError(f"seq_axis must be 2 or 3, got {seq_axis}")

    return pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ell, b, nk),
            in_specs=[pl.BlockSpec(block, in_map)],
            out_specs=[pl.BlockSpec(block, out_map)],
        ),
        out_shape=[jax.ShapeDtypeStruct(c.shape, c.dtype)],
        # flattened operand indexing counts the scalar-prefetch table first:
        # 0 = table, 1 = the cache plane -> aliased onto output 0.
        # TPU-only: the in-place alias is an HBM-capacity measure; under
        # the CPU interpreter it buys nothing and aliased donated buffers
        # in interpret mode are a heap-corruption suspect (late-suite
        # XLA-CPU compile segfaults appeared with these tests — CLAUDE.md)
        input_output_aliases={} if _interpret() else {1: 0},
        interpret=_interpret(),
    )(scalars, c)[0]


def count_removable_blocks(mask_row, pos: int, block_k: int) -> int:
    """Number of fully-invalid blocks of this row in [0, pos) — the row's
    compaction headroom. The engine removes the MINIMUM across live rows
    from every row so the shared cursor shifts by one common multiple of
    block_k (see build_row_table's bit-equality argument)."""
    import numpy as np

    if pos <= 0:
        return 0
    nb = (pos - 1) // block_k + 1
    mpad = np.zeros(nb * block_k, bool)
    mpad[:min(pos, mask_row.shape[0])] = mask_row[:pos]
    return int((~mpad.reshape(nb, block_k).any(axis=1)).sum())

def build_row_table(mask_row, pos: int, block_k: int, nk: int, h: int):
    """Host-side compaction plan for ONE row's (S,) validity mask: delete
    the row's first `h` fully-invalid blocks in [0, pos), shifting every
    later block left to fill the gaps.

    Bit-equality argument (the engine's contract across a compaction
    event): the decode kernel's compacted sweep visits the row's VALID
    blocks in index order; deleting empty blocks changes valid blocks'
    INDICES but not one bit of any per-block (content, lane-mask) input,
    nor their order. The shared cursor shifts by exactly h * block_k —
    the same h for every live row — so every row's future writes land at
    lane offsets congruent to the uncompacted run's, grouping into blocks
    identically, forever. Entries are left-moving (a block shifts down by
    at most the number of empties below it), satisfying
    gather_cache_blocks's in-place contract.

    Returns (table (nk,) int32, new_mask (S,) bool). The caller must pass
    h <= count_removable_blocks(mask_row, pos, block_k).
    """
    import numpy as np

    table = np.arange(nk, dtype=np.int32)
    new_mask = np.zeros(mask_row.shape[0], bool)
    nb = 0 if pos <= 0 else (pos - 1) // block_k + 1
    mpad = np.zeros(nk * block_k, bool)
    mpad[:min(pos, mask_row.shape[0])] = mask_row[:pos]
    blocks = mpad.reshape(nk, block_k)
    occupied = blocks[:nb].any(axis=1)
    empties = np.flatnonzero(~occupied)
    assert h <= empties.shape[0], (h, empties.shape[0])
    removed = set(empties[:h].tolist())
    dest = 0
    for sb in range(nb):
        if sb in removed:
            continue
        table[dest] = sb
        new_mask[dest * block_k:(dest + 1) * block_k] = blocks[sb]
        dest += 1
    return table, new_mask
