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


class RelationContext:
    """The relation-side UDF surface: ``relation_scan_function`` gets
    Find/Holds/Accept (reference scanRelation,
    src/osm_lua_processing.cpp:1078-1092); ``relation_postscan_function``
    additionally iterates the ancestor chain with NextRelation /
    FindInRelation and writes with SetTag (postScanRelations,
    osm_lua_processing.cpp:1096-1108)."""

    def __init__(self):
        self._id = None
        self._tags = {}
        self._accepted = False
        self._rel_list = []     # [(ancestor_id, role)]
        self._reltags = {}
        self._sub = -1

    def _reset(self, rid, tags, rel_list=None, reltags=None):
        self._id = rid
        self._tags = tags
        self._accepted = False
        self._rel_list = rel_list or []
        self._reltags = reltags or {}
        self._sub = -1

    def Id(self):
        return self._id

    def Find(self, key: str) -> str:
        v = self._tags.get(key)
        return "" if v is None else str(v)

    def Holds(self, key: str) -> bool:
        return self._tags.get(key) is not None

    def AllTags(self) -> dict:
        return dict(self._tags)

    def Accept(self):
        self._accepted = True

    def SetTag(self, key: str, value):
        self._tags[key] = value

    def NextRelation(self):
        self._sub += 1
        if self._sub >= len(self._rel_list):
            return None
        return self._rel_list[self._sub]

    def RestartRelations(self):
        self._sub = -1

    def FindInRelation(self, key: str) -> str:
        if not (0 <= self._sub < len(self._rel_list)):
            return ""
        rid = self._rel_list[self._sub][0]
        v = self._reltags.get(rid, {}).get("tags", {}).get(key)
        return "" if v is None else str(v)


def scan_relations_udf(rel_table: pa.Table, relation_scan_function) -> dict:
    """M6 with a USER scan function: the UDF calls ctx.Accept() to keep
    a relation (instead of the accept-predicate shorthand)."""
    ctx = RelationContext()
    out = {}
    cols = rel_table.column_names
    for i in range(rel_table.num_rows):
        rid = rel_table["rel_id"][i].as_py()
        tags = {c: rel_table[c][i].as_py() for c in cols
                if c not in ("rel_id", "parent_id")}
        ctx._reset(rid, tags)
        relation_scan_function(ctx)
        if not ctx._accepted:
            continue
        parent = (rel_table["parent_id"][i].as_py()
                  if "parent_id" in cols else None)
        out[rid] = {"parent": parent, "tags": dict(tags)}
    return out


def _ancestor_chain(relations: dict, rid) -> list:
    chain = []
    seen = {rid}
    p = relations[rid]["parent"]
    while p is not None and p in relations and p not in seen:
        chain.append((p, "parent"))
        seen.add(p)
        p = relations[p]["parent"]
    return chain


def postscan_relations_udf(relations: dict, relation_postscan_function) -> dict:
    """M7 with a USER postscan function: for each accepted relation the
    ctx iterates its ancestor chain (NextRelation/FindInRelation) and
    mutates its own tags with SetTag — the bounce-down pattern."""
    ctx = RelationContext()
    for rid in sorted(relations, key=lambda r: (str(type(r)), r)):
        r = relations[rid]
        ctx._reset(rid, r["tags"], _ancestor_chain(relations, rid),
                   relations)
        relation_postscan_function(ctx)
        r["tags"] = dict(ctx._tags)
    return relations
