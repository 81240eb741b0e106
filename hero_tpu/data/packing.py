"""Sub packing: multiple subtitles per f-encoder row.

The fixed bucket (``FixedShapes``) pays one (frames_per_sub + txt_len)
row per subtitle, but TV-distribution subs average ~3 matched frames and
~15 BPE tokens (measured: ``hero_tpu/data/occupancy.py``) — at the bench
bucket (16+40 slots) a typical row is ~70% padding, and BOTH this stack
and the reference's dynamic padding (``data/data.py:406-512``) waste
~2.8× FLOPs vs the zero-pad ideal.  Packing claws that back: several
subs share one row, a per-slot SEGMENT id drives a block-diagonal
attention mask (ops/attention.py seg mode), per-slot position ids
restart at each segment, and ``sub_frame_idx`` stays per-slot so the
clip-timeline scatter (models/model.py collect_frame_outputs) is
unchanged.  Numerically exact vs unpacked rows in eval mode: cross-
segment scores carry the same -1e4 bias as masked keys, whose softmax
contribution underflows to exactly 0 in fp32 (tested:
tests/test_packing.py).

The packer is first-fit in subtitle order (deterministic, no RNG): a sub
goes into the first open row with room for its tokens AND its frames,
subject to ``PACK_MAX_SEGS`` segments per row; subs that fit no row are
dropped and counted in the dataset's truncation audit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from hero_tpu.const import PACK_MAX_SEGS


@dataclass
class Placement:
    """Where one sub landed: row index + text/frame slot offsets."""
    row: int
    seg: int          # segment id within the row (one-hot index)
    toff: int         # first text slot
    tlen: int
    foff: int         # first frame slot
    flen: int


def pack_queries(lens: Sequence[int], row_len: int, max_segs: int = 4
                 ) -> Tuple[List[Placement], int]:
    """Best-fit-decreasing query → row packing (serve phase 2).

    Queries average ~15 BPE in a ~30-slot bucket (TVR descriptions), so
    the reference's per-query row layout (and our unpacked bucket) runs
    the query encoder at ~50% occupancy; packing 2-3 queries per row
    behind the same block-diagonal segment mask halves the encoder work.
    Unlike subs, queries are NEVER dropped: a new row opens whenever no
    open row fits (any query with ``len <= row_len`` lands exactly once),
    so the result is exact — only the layout changes.

    Best-fit over a remaining-capacity index keeps this O(N·row_len)
    (first-fit's O(N·rows) scan is quadratic at corpus-eval query counts).
    Returns (placements indexed like ``lens``, n_rows).
    """
    order = sorted(range(len(lens)), key=lambda i: (-lens[i], i))
    # rows bucketed by remaining capacity; a row leaves the index when
    # its segment budget is spent
    by_rem: List[List[int]] = [[] for _ in range(row_len + 1)]
    t_used: List[int] = []
    segs: List[int] = []
    out: List[Optional[Placement]] = [None] * len(lens)
    for i in order:
        tl = lens[i]
        if not 0 < tl <= row_len:
            raise ValueError(f"query length {tl} outside (0, {row_len}]")
        row = None
        for rem in range(tl, row_len + 1):     # smallest sufficient rem
            if by_rem[rem]:
                row = by_rem[rem].pop()
                break
        if row is None:
            row = len(t_used)
            t_used.append(0)
            segs.append(0)
        out[i] = Placement(row, segs[row], t_used[row], tl, 0, 0)
        t_used[row] += tl
        segs[row] += 1
        if segs[row] < max_segs and t_used[row] < row_len:
            by_rem[row_len - t_used[row]].append(row)
    return out, len(t_used)           # type: ignore[return-value]


def pack_subs(lens: Sequence[Tuple[int, int]], n_rows: int, txt_len: int,
              frames_per_sub: int, max_segs: int = PACK_MAX_SEGS
              ) -> List[Optional[Placement]]:
    """First-fit sub → row assignment.

    ``lens``: per-sub (n_text_tokens, n_frames).  Returns one
    :class:`Placement` per sub (None = dropped: no row had room).
    """
    t_used = [0] * n_rows
    f_used = [0] * n_rows
    segs = [0] * n_rows
    out: List[Optional[Placement]] = []
    for tlen, flen in lens:
        placed = None
        for r in range(n_rows):
            if (t_used[r] + tlen <= txt_len
                    and f_used[r] + flen <= frames_per_sub
                    and segs[r] < max_segs):
                placed = Placement(r, segs[r], t_used[r], tlen,
                                   f_used[r], flen)
                t_used[r] += tlen
                f_used[r] += flen
                segs[r] += 1
                break
        out.append(placed)
    return out
