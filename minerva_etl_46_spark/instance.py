"""Instance definitions: declarative YAML → catalog, with diff/apply
(SURVEY.md §1 D11; [ref: crates/minerva/src/instance.rs, src/changes/ —
UNVERIFIED [M]]).

The reference's `minerva` CLI loads a directory of YAML documents declaring
trend stores, attribute stores, relations and triggers, diffs them against
the live schema, and applies the delta as typed change objects (add trend
store, add trend, modify data type…). Here the "live schema" is a catalog
Instance; changes are plain dataclasses a deployment layer executes
(creating storage dirs, evolving parquet schemas — parquet schema evolution
is additive-friendly, so AddTrend is metadata-only).
"""

from __future__ import annotations

from dataclasses import dataclass

import yaml

from minerva_etl_46_spark.catalog import (
    AttributeStore,
    Instance,
    Relation,
    Trend,
    TrendStore,
    TrendStorePart,
    TriggerRule,
)


def _trend(d: dict) -> Trend:
    return Trend(
        name=d["name"],
        data_type=d.get("data_type", "double precision"),
        time_aggregation=d.get("time_aggregation", "sum"),
        entity_aggregation=d.get("entity_aggregation", "sum"),
        samples_column=d.get("samples_column"),
        extra_data=d.get("extra_data", {}),
    )


def instance_from_dict(doc: dict) -> Instance:
    """Build a catalog Instance from a parsed instance-definition document.

    Schema mirrors the reference's YAML layout (trend_stores with parts and
    per-trend aggregation declarations, etc.)."""
    tstores = tuple(
        TrendStore(
            data_source=ts["data_source"],
            entity_type=ts["entity_type"],
            granularity=ts["granularity"],
            partition_size_seconds=ts.get("partition_size_seconds", 86400),
            retention_days=ts.get("retention_days"),
            parts=tuple(
                TrendStorePart(
                    name=p["name"],
                    trends=tuple(_trend(t) for t in p.get("trends", ())),
                )
                for p in ts.get("parts", ())
            ),
        )
        for ts in doc.get("trend_stores", ())
    )
    astores = tuple(
        AttributeStore(
            data_source=a["data_source"],
            entity_type=a["entity_type"],
            attributes=tuple(_trend(t) for t in a.get("attributes", ())),
        )
        for a in doc.get("attribute_stores", ())
    )
    relations = tuple(
        Relation(name=r["name"], source_entity_type=r["source_entity_type"],
                 target_entity_type=r["target_entity_type"])
        for r in doc.get("relations", ())
    )
    triggers = tuple(
        TriggerRule(name=t["name"], predicate_sql=t["predicate"],
                    weight_sql=str(t.get("weight", "1")),
                    details_cols=tuple(t.get("details", ())))
        for t in doc.get("triggers", ())
    )
    return Instance(trend_stores=tstores, attribute_stores=astores,
                    relations=relations, triggers=triggers)


def instance_from_yaml(text: str) -> Instance:
    return instance_from_dict(yaml.safe_load(text) or {})


# ---- change objects ([ref: src/changes/ — UNVERIFIED [M]]) ----

@dataclass(frozen=True)
class AddTrendStore:
    store_key: str


@dataclass(frozen=True)
class RemoveTrendStore:
    store_key: str


@dataclass(frozen=True)
class AddTrend:
    store_key: str
    part: str
    trend: str


@dataclass(frozen=True)
class RemoveTrend:
    store_key: str
    part: str
    trend: str


@dataclass(frozen=True)
class ModifyTrend:
    """Data type or aggregation-function change."""

    store_key: str
    part: str
    trend: str
    field: str
    old: object
    new: object


@dataclass(frozen=True)
class AddAttributeStore:
    store_key: str


@dataclass(frozen=True)
class RemoveAttributeStore:
    store_key: str


@dataclass(frozen=True)
class AddAttribute:
    store_key: str
    attribute: str


@dataclass(frozen=True)
class RemoveAttribute:
    store_key: str
    attribute: str


@dataclass(frozen=True)
class AddTrigger:
    name: str


@dataclass(frozen=True)
class RemoveTrigger:
    name: str


@dataclass(frozen=True)
class ModifyTrigger:
    name: str
    field: str
    old: object
    new: object


Change = (
    AddTrendStore | RemoveTrendStore | AddTrend | RemoveTrend | ModifyTrend
    | AddAttributeStore | RemoveAttributeStore | AddAttribute | RemoveAttribute
    | AddTrigger | RemoveTrigger | ModifyTrigger
)


def _store_key(ts: TrendStore) -> str:
    return f"{ts.data_source}/{ts.entity_type}/{ts.granularity}"


def diff_instances(current: Instance, desired: Instance) -> list[Change]:
    """The `minerva diff` shape: typed delta from live schema to desired."""
    changes: list[Change] = []
    cur = {_store_key(s): s for s in current.trend_stores}
    want = {_store_key(s): s for s in desired.trend_stores}
    for k in sorted(want.keys() - cur.keys()):
        changes.append(AddTrendStore(k))
    for k in sorted(cur.keys() - want.keys()):
        changes.append(RemoveTrendStore(k))
    for k in sorted(cur.keys() & want.keys()):
        cparts = {p.name: p for p in cur[k].parts}
        wparts = {p.name: p for p in want[k].parts}
        for pname in sorted(set(cparts) | set(wparts)):
            ct = {t.name: t for t in cparts[pname].trends} if pname in cparts else {}
            wt = {t.name: t for t in wparts[pname].trends} if pname in wparts else {}
            for t in sorted(wt.keys() - ct.keys()):
                changes.append(AddTrend(k, pname, t))
            for t in sorted(ct.keys() - wt.keys()):
                changes.append(RemoveTrend(k, pname, t))
            for t in sorted(ct.keys() & wt.keys()):
                for fieldname in ("data_type", "time_aggregation", "entity_aggregation"):
                    o, n = getattr(ct[t], fieldname), getattr(wt[t], fieldname)
                    if o != n:
                        changes.append(ModifyTrend(k, pname, t, fieldname, o, n))

    def akey(a) -> str:
        return f"{a.data_source}/{a.entity_type}"

    acur = {akey(a): a for a in current.attribute_stores}
    awant = {akey(a): a for a in desired.attribute_stores}
    for k in sorted(awant.keys() - acur.keys()):
        changes.append(AddAttributeStore(k))
    for k in sorted(acur.keys() - awant.keys()):
        changes.append(RemoveAttributeStore(k))
    for k in sorted(acur.keys() & awant.keys()):
        ca = {t.name for t in acur[k].attributes}
        wa = {t.name for t in awant[k].attributes}
        for a in sorted(wa - ca):
            changes.append(AddAttribute(k, a))
        for a in sorted(ca - wa):
            changes.append(RemoveAttribute(k, a))

    tcur = {t.name: t for t in current.triggers}
    twant = {t.name: t for t in desired.triggers}
    for n in sorted(twant.keys() - tcur.keys()):
        changes.append(AddTrigger(n))
    for n in sorted(tcur.keys() - twant.keys()):
        changes.append(RemoveTrigger(n))
    for n in sorted(tcur.keys() & twant.keys()):
        for fieldname in ("predicate_sql", "weight_sql", "details_cols"):
            o, w = getattr(tcur[n], fieldname), getattr(twant[n], fieldname)
            if o != w:
                changes.append(ModifyTrigger(n, fieldname, o, w))
    return changes
