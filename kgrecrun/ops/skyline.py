"""Distributed 2-D skyline (Pareto frontier): the rows not DOMINATED by
any other row, where q dominates p iff q.x <= p.x AND q.y <= p.y with
strict inequality in at least one coordinate (both minimized; flip sign
upstream to maximize). Exact duplicates dominate nothing, so tied
frontier points all survive — matching the SQL ``NOT EXISTS`` oracle.

Scale shape — skylines are MAP-COMBINABLE (the global skyline of a
union equals the skyline of the union of per-part skylines):

1. **Map-side combiner** — each input block drops its dominated rows
   with one vectorized lexsort + strict-prefix-min sweep (O(n log n),
   no pairwise matrix). A uniformly-distributed block of n rows keeps
   O(log n) candidates; even adversarial inputs keep only the block's
   own frontier.
2. **One single-task reduce** — surviving candidates concatenate into
   one block (``repartition(1)``) and the same sweep runs once more.
   ASSUMPTION (documented, standard for skylines): the GLOBAL frontier
   fits one worker — frontier size is O(sqrt(n)) for independent dims
   and typically far smaller; a frontier that large means the two
   columns are anti-correlated end-to-end and the query answer itself
   is corpus-order, which no engine returns whole.

Determinism: the survivor SET is order-free (dominance is a property of
values, not layout), so output is identical across block layouts and
parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _local_skyline(t: pa.Table, x: str, y: str) -> pa.Table:
    """Drop rows dominated within ``t`` — one lexsort, one strict-prefix
    cummin over the x-groups, all vectorized."""
    if t.num_rows == 0:
        return t
    order = pc.sort_indices(t, sort_keys=[(x, "ascending"), (y, "ascending")])
    s = t.take(order)
    xv = s[x].combine_chunks().to_numpy(zero_copy_only=False)
    yv = s[y].combine_chunks().to_numpy(zero_copy_only=False)
    n = len(xv)
    # min y among rows with STRICTLY smaller x: carry the running cummin
    # forward only across x-group boundaries.
    new_x = np.ones(n, dtype=bool)
    new_x[1:] = xv[1:] != xv[:-1]
    cummin = np.minimum.accumulate(yv)
    # value of the cummin at the END of the previous x-group, per row
    group_id = np.cumsum(new_x) - 1  # 0-based x-group index
    last_idx_of_group = np.flatnonzero(np.append(new_x[1:], True))
    big = np.iinfo(yv.dtype).max if np.issubdtype(yv.dtype, np.integer) else np.inf
    prev_min_per_group = np.concatenate(
        ([big], cummin[last_idx_of_group][:-1]))
    prev_group_min = prev_min_per_group[group_id]
    # dominated by a strictly-smaller-x row iff its y >= that row's y;
    # dominated within the same x iff a smaller y exists in the group
    # (the group's first row after the lexsort has the group min y).
    group_first_y = yv[np.flatnonzero(new_x)][group_id]
    dominated = (prev_group_min <= yv) | (yv > group_first_y)
    return s.filter(pa.array(~dominated))


def pareto_frontier(ds, *, x: str, y: str):
    """Rows of ``ds`` on the (minimize ``x``, minimize ``y``) Pareto
    frontier; all other columns ride along. ``x``/``y`` should be
    integer-typed (cents, sizes) for bit-exact cross-engine parity."""

    def local(batch: pa.Table) -> pa.Table:
        return _local_skyline(batch, x, y)

    def final(batch: pa.Table) -> pa.Table:
        return _local_skyline(batch, x, y)

    return (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow")
    )
