"""Broadcast resources for the stateful KG stages.

The gazetteer (alias dictionary + entity metadata) is loaded ONCE into
the Ray object store via ``ray.put`` and every actor reads it zero-copy
in ``__init__`` — never re-shipped per batch (SURVEY.md §2.4 joins →
broadcast side). Stages accept either the raw resource (unit tests, no
Ray) or an ``ObjectRef`` (pipeline mode).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class KGResources:
    """The broadcastable resource bundle for NER / OpenIE / linking.

    alias: surface form (lowercased) → candidate entity ids
    etype: entity id → person|org|place
    canonical: entity id → canonical display name
    """

    alias: dict[str, list[str]]
    etype: dict[str, str]
    canonical: dict[str, str]

    @classmethod
    def from_world(cls, world) -> "KGResources":
        return cls(
            alias=world.alias_dictionary(),
            etype={e.entity_id: e.etype for e in world.entities},
            canonical={e.entity_id: e.canonical for e in world.entities},
        )

    @classmethod
    def from_entity_table(cls, table) -> "KGResources":
        """Build from an ``entities`` pyarrow table
        (entity_id, etype, canonical, aliases: list<string>)."""
        alias: dict[str, list[str]] = {}
        etype: dict[str, str] = {}
        canonical: dict[str, str] = {}
        for row in table.to_pylist():
            eid = row["entity_id"]
            etype[eid] = row["etype"]
            canonical[eid] = row["canonical"]
            for a in row["aliases"]:
                alias.setdefault(a.lower(), []).append(eid)
        return cls(alias=alias, etype=etype, canonical=canonical)


def resolve(resource):
    """Actor-side: resolve a broadcast handle (ObjectRef → ray.get, plain
    object → as-is). Called once per actor in ``__init__``."""
    try:
        import ray

        if isinstance(resource, ray.ObjectRef):
            return ray.get(resource)
    except ImportError:
        pass
    return resource


def broadcast(resource):
    """Driver-side: put the resource in the object store once."""
    import ray

    return ray.put(resource)
