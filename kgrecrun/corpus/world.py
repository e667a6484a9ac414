"""Deterministic entity world: entities with aliases, predicates with
sentence templates, and noise sentence material.

Shared by two consumers with a deliberate boundary between them:

* ``corpus.synthgen`` uses it to PLANT fact sentences in generated pages
  (and records the planted (subj, pred, obj) ground truth);
* the KG pipeline uses :func:`alias_dictionary` as its entity-linking
  resource (in production this would be an external gazetteer shipped to
  every node via ``ray.put``).

Everything is seeded and pure — no I/O, no randomness outside
``random.Random`` instances created from explicit seeds.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

FIRST_NAMES = (
    "Ada Alan Amara Anders Beatriz Boris Carla Chen Dalia Dmitri Elena Emeka "
    "Farah Gustav Hana Hiro Ingrid Ivan Jamal Joan Kenji Lara Mateo Mina "
    "Nadia Noor Omar Priya Quentin Rosa Samir Sofia Tariq Uma Viktor Wanda "
    "Xiomara Yusuf Zara Niamh"
).split()
LAST_NAMES = (
    "Abara Bergström Castillo Dvorak Eriksen Fontaine Grigoryan Haddad "
    "Iwata Jansson Kowalski Lindqvist Moreau Novak Okafor Petrov Quispe "
    "Rossi Sato Tanaka Ueda Vargas Weber Xu Yamamoto Zhang Keita Osei "
    "Nakamura Fischer Silva Costa Meyer Andersen Popescu Horvat Virtanen "
    "Nilsen Duarte Björk"
).split()
ORG_STEMS = (
    "Helix Vertex Quanta Borealis Cinder Aurora Granite Meridian Atlas "
    "Harbor Summit Cascade Juniper Lattice Onyx Prism Riverton Solstice "
    "Tundra Vanguard Willow Zenith Cobalt Drift Ember Fathom"
).split()
ORG_SUFFIXES = ("Systems", "Labs", "Industries", "Holdings", "Analytics", "Dynamics", "Works")
CITIES = (
    "Avalor Brinmont Calderis Dunhaven Eastmere Fairpool Gildford Harrowgate "
    "Ivywick Jorvale Kestrel Larkspur Midlothian Northolme Oakridge Pellham "
    "Quarry Redmoor Silverford Thornbury Umberton Vexley Westcliffe Yarrow"
).split()
COUNTRIES = (
    "Aldovia Brelland Corvania Drustan Elloria Fennmark Galdor Hestravia "
    "Ithria Jovenia Kaldria Lorvein Morennia Norvale Ostreva Pellandria"
).split()


@dataclass(frozen=True)
class Entity:
    entity_id: str
    etype: str  # person | org | place
    canonical: str
    aliases: tuple[str, ...]  # includes canonical

    @property
    def surfaces(self) -> tuple[str, ...]:
        return self.aliases


def _org_aliases(rng: random.Random, name: str) -> list[str]:
    stem, suffix = name.rsplit(" ", 1)
    aliases = [name, stem]
    abbrev = "".join(w[0] for w in name.split()).upper()
    if len(abbrev) >= 2:
        aliases.append(abbrev)
    if rng.random() < 0.5:
        aliases.append(f"{stem} {suffix[:-1]}" if suffix.endswith("s") else f"{stem} Group")
    return aliases


def _person_aliases(rng: random.Random, first: str, last: str) -> list[str]:
    full = f"{first} {last}"
    aliases = [full, last]
    if rng.random() < 0.4:
        aliases.append(f"{first[0]}. {last}")
    return aliases


def build_world(seed: int = 42, n_people: int = 120, n_orgs: int = 60, n_places: int = 40) -> list[Entity]:
    rng = random.Random(seed)
    entities: list[Entity] = []
    used: set[str] = set()
    i = 0
    while len([e for e in entities if e.etype == "person"]) < n_people:
        first = rng.choice(FIRST_NAMES)
        last = rng.choice(LAST_NAMES)
        full = f"{first} {last}"
        if full in used:
            i += 1
            continue
        used.add(full)
        entities.append(
            Entity(f"P{len(entities):05d}", "person", full, tuple(_person_aliases(rng, first, last)))
        )
    while len([e for e in entities if e.etype == "org"]) < n_orgs:
        name = f"{rng.choice(ORG_STEMS)} {rng.choice(ORG_SUFFIXES)}"
        if name in used:
            continue
        used.add(name)
        entities.append(Entity(f"O{len(entities):05d}", "org", name, tuple(_org_aliases(rng, name))))
    places = CITIES + COUNTRIES
    for name in places[: n_places]:
        entities.append(Entity(f"L{len(entities):05d}", "place", name, (name,)))
    return entities


# Predicate templates. Each instantiates one sentence carrying exactly one
# (subj, pred, obj) fact; the OpenIE stage recognizes the same patterns.
# (pred, template, subj_type, obj_type)
TRIPLE_TEMPLATES: list[tuple[str, str, str, str]] = [
    ("founded", "{subj} founded {obj}.", "person", "org"),
    ("acquired", "{subj} acquired {obj}.", "org", "org"),
    ("located_in", "{subj} is located in {obj}.", "org", "place"),
    ("works_for", "{subj} works for {obj}.", "person", "org"),
    ("born_in", "{subj} was born in {obj}.", "person", "place"),
    ("ceo_of", "{subj} is the chief executive of {obj}.", "person", "org"),
    ("partnered_with", "{subj} partnered with {obj}.", "org", "org"),
    ("headquartered_in", "{subj} is headquartered in {obj}.", "org", "place"),
]

NOISE_SENTENCES = (
    "The weather remained unseasonably mild throughout the quarter.",
    "Several committees reviewed the proposal before the final vote.",
    "Analysts expect the trend to continue well into next spring.",
    "The report cites improvements in logistics and scheduling.",
    "Residents gathered near the old bridge to watch the ceremony.",
    "A revised timetable will be published at the end of the month.",
    "Early trials produced inconclusive but encouraging results.",
    "The festival drew record crowds despite the morning rain.",
    "Negotiations continued late into the evening without agreement.",
    "The archive contains thousands of uncatalogued photographs.",
    "Officials declined to comment on the pending litigation.",
    "Attendance figures improved steadily over the five-year period.",
)

NON_EN_SENTENCES = {
    "de": (
        "Der Bericht wurde am Dienstag veröffentlicht und sorgte für Aufsehen.",
        "Die Behörden kündigten eine umfassende Überprüfung der Daten an.",
        "Viele Besucher kamen trotz des schlechten Wetters in die Stadt.",
    ),
    "fr": (
        "Le rapport a été publié mardi et a suscité de nombreuses réactions.",
        "Les autorités ont annoncé une révision complète des données.",
        "De nombreux visiteurs sont venus malgré le mauvais temps.",
    ),
    "es": (
        "El informe se publicó el martes y provocó numerosas reacciones.",
        "Las autoridades anunciaron una revisión completa de los datos.",
        "Muchos visitantes llegaron a pesar del mal tiempo.",
    ),
}


def alias_dictionary(entities: list[Entity]) -> dict[str, list[str]]:
    """surface form (lowercased) → candidate entity ids. This is the
    entity-linking resource broadcast to workers via ``ray.put``."""
    d: dict[str, list[str]] = {}
    for e in entities:
        for a in e.aliases:
            d.setdefault(a.lower(), []).append(e.entity_id)
    return d
