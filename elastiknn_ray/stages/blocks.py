"""Block-layout repair utilities.

Ray Data's hash-shuffle groupby emits one block per partition; partitions
that received zero rows finalize as EMPTY, SCHEMA-LESS Arrow tables.  Acero
joins resolve key fields per block, so a schema-less right-side block fails
with "No match or multiple matches for key field reference ...".
``map_batches`` cannot repair them (empty blocks pass through unexecuted),
so we drop them at the object-ref level — metadata-only, no data moves.
"""

from __future__ import annotations


def drop_empty_blocks(ds):
    """Return ``ds`` minus empty blocks (refs are reused, nothing is copied).

    Use on a MATERIALIZED groupby/aggregate output before feeding it into a
    ``Dataset.join``.  Returns None when every block is empty (callers gate
    on count() first, so this is a defensive signal, not a normal path).
    """
    import ray.data as rd

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs:
        return None
    return rd.from_arrow_refs(refs)
