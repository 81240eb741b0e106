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
