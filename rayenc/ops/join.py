"""Broadcast hash join: the scale-correct join when one side is small.

Instead of an all-to-all shuffle join, the small side is `ray.put` into
the object store ONCE and every map_batches task joins its (streamed)
batch against it with arrow's hash-join kernel — zero data movement for
the big side, one object-store read per task for the small side. This
is the pattern the 100 TB runbook prescribes for dimension tables
(customer, part, supplier joined onto lineitem/orders).

For big-big joins, pre-bucket both sides by key hash and join bucket
pairs; that path is `groupby(key).map_groups` composition and is out of
scope here — this module is the broadcast case only, and raises if the
small side exceeds ``max_broadcast_bytes`` so a misuse fails loudly
instead of silently shipping gigabytes per task.
"""

from __future__ import annotations

import pyarrow as pa

import ray

DEFAULT_MAX_BROADCAST = 512 << 20  # half a GiB of arrow buffers


def broadcast_join(
    ds,
    right: pa.Table,
    keys,
    join_type: str = "inner",
    right_suffix: str = "_r",
    max_broadcast_bytes: int = DEFAULT_MAX_BROADCAST,
):
    """Join a Dataset (left, streamed) against an in-memory table (right,
    broadcast). ``keys`` is a column name or list shared by both sides;
    ``join_type`` is any arrow join kind ("inner", "left outer", ...).
    Overlapping non-key right columns get ``right_suffix``."""
    if isinstance(keys, str):
        keys = [keys]
    if right.nbytes > max_broadcast_bytes:
        raise ValueError(
            f"right side is {right.nbytes >> 20} MiB — too large to "
            "broadcast; bucket both sides by key hash instead"
        )
    right = right.combine_chunks()
    ref = ray.put(right)

    def join_batch(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)  # zero-copy from the local object store
        return batch.join(
            r, keys=keys, join_type=join_type,
            right_suffix=right_suffix, use_threads=False,
        )

    return ds.map_batches(join_batch, batch_format="pyarrow")
