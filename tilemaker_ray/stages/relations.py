"""Relation membership machinery (J3 / M6 / M7 analogs).

The reference scans relations with a per-relation accept predicate
(relation_scan_function, /root/reference/src/pbf_processor.cpp:201-259),
exposes each entity's memberships to the UDF (relations_for_way/
FindInRelation, include/osm_store.h:139-199), and bounces tags down
nested relation trees in a post-scan (relation_postscan_function +
SetTag, src/osm_lua_processing.cpp:1096-1108).

Ray-native shape: relations are a SMALL driver-side table (accepted
subset only); tag propagation down the parent tree is an iterative
driver computation (the reference also runs it single-threaded at
scan end); the resulting member→tags map broadcasts into map_batches
where the per-record join is a dict lookup — a broadcast semi-join,
never a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def scan_relations(rel_table: pa.Table, accept=None) -> dict:
    """M6: accept-predicate scan → {rel_id: {"parent": id|None,
    "tags": {...}}}. ``accept(tags) -> bool`` mirrors
    relation_scan_function's Accept()."""
    out = {}
    cols = rel_table.column_names
    for i in range(rel_table.num_rows):
        rid = rel_table["rel_id"][i].as_py()
        tags = {c: rel_table[c][i].as_py() for c in cols
                if c not in ("rel_id", "parent_id")}
        if accept is not None and not accept(tags):
            continue
        parent = (rel_table["parent_id"][i].as_py()
                  if "parent_id" in cols else None)
        out[rid] = {"parent": parent, "tags": tags}
    return out


def propagate_tags(relations: dict, keys: list) -> dict:
    """M7 post-scan: each relation inherits missing ``keys`` from its
    ancestors (SetTag bounce-down). Iterates to a fixed point, so
    arbitrarily nested trees converge; cycles are ignored safely."""
    changed = True
    rounds = 0
    while changed and rounds < 64:
        changed = False
        rounds += 1
        for rid, r in relations.items():
            p = r["parent"]
            if p is None or p not in relations:
                continue
            for k in keys:
                if not r["tags"].get(k) and relations[p]["tags"].get(k):
                    r["tags"][k] = relations[p]["tags"][k]
                    changed = True
    return relations


def make_membership_tagger(member_map_ref, id_col: str, out_cols: list):
    """J3: broadcast member→tags dict; map_batches body adds the joined
    tag columns (FindInRelation analog). Missing members get None."""

    def tag(batch: pa.Table) -> pa.Table:
        import ray
        m = (ray.get(member_map_ref)
             if isinstance(member_map_ref, ray.ObjectRef) else member_map_ref)
        ids = batch[id_col].to_pylist()
        for c in out_cols:
            vals = [(m.get(i) or {}).get(c) for i in ids]
            batch = batch.append_column(c, pa.array(vals, pa.string()))
        return batch

    return tag


def build_member_map(memberships: pa.Table, relations: dict,
                     member_col: str, rel_col: str) -> dict:
    """member id → merged tags of all its accepted relations (later
    relations win ties deterministically by rel id order)."""
    out: dict = {}
    mids = memberships[member_col].to_pylist()
    rids = memberships[rel_col].to_pylist()
    order = np.argsort(np.asarray(rids, dtype=np.int64), kind="stable")
    for i in order:
        rid = rids[i]
        r = relations.get(rid)
        if r is None:
            continue
        out.setdefault(mids[i], {}).update(r["tags"])
    return out
