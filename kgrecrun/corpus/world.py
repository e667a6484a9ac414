"""Deterministic entity world: entities with aliases, duplicate "twin"
records, predicates with sentence templates, and noise material.

Shared by two consumers with a deliberate boundary between them:

* ``corpus.synthgen`` uses it to PLANT fact sentences in generated pages
  (recording planted (subj, pred, obj) ground truth at both the surface
  level and the canonical-cluster level);
* the KG pipeline uses :func:`World.alias_dictionary` as its
  entity-linking resource (in production an external gazetteer shipped
  to every node once via ``ray.put``).

Design choices that matter for the evaluation:

* **Twins** — a fraction of org entities exist twice under different ids
  with near-duplicate names ("Granite Holdings" / "Granite Holdings
  Inc."). The canonicalization stage (minhash-LSH blocking + union-find)
  must merge them; ``gold_clusters`` maps every id to its cluster root.
* **Unambiguous aliases** — each surface form maps to exactly one
  entity id (org stems unique, bare last names only when unique), so
  linking accuracy is measurable independently of canonicalization.
  The linker still handles multi-candidate surfaces generically.
* **Zipf skew** — synthgen samples entities with a Zipf prior, so a few
  entities are hot keys; the shuffle stages must handle that skew.

Everything is seeded and pure — no I/O, no global randomness.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

FIRST_NAMES = (
    "Ada Alan Amara Anders Beatriz Boris Carla Chen Dalia Dmitri Elena Emeka "
    "Farah Gustav Hana Hiro Ingrid Ivan Jamal Joan Kenji Lara Mateo Mina "
    "Nadia Noor Omar Priya Quentin Rosa Samir Sofia Tariq Uma Viktor Wanda "
    "Xiomara Yusuf Zara Niamh"
).split()
LAST_NAMES = (
    "Abara Bergstrom Castillo Dvorak Eriksen Fontaine Grigoryan Haddad "
    "Iwata Jansson Kowalski Lindqvist Moreau Novak Okafor Petrov Quispe "
    "Rossi Sato Tanaka Ueda Vargas Weber Xu Yamamoto Zhang Keita Osei "
    "Nakamura Fischer Silva Costa Meyer Andersen Popescu Horvat Virtanen "
    "Nilsen Duarte Bjork"
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
    aliases: tuple[str, ...]  # includes canonical; globally unambiguous

    @property
    def surfaces(self) -> tuple[str, ...]:
        return self.aliases


@dataclass
class World:
    seed: int
    entities: list[Entity]
    gold_clusters: dict[str, str]  # entity_id -> cluster root id
    by_type: dict[str, list[Entity]] = field(default_factory=dict)

    def __post_init__(self):
        if not self.by_type:
            for e in self.entities:
                self.by_type.setdefault(e.etype, []).append(e)

    def alias_dictionary(self) -> dict[str, list[str]]:
        """surface form (lowercased) → candidate entity ids."""
        d: dict[str, list[str]] = {}
        for e in self.entities:
            for a in e.aliases:
                d.setdefault(a.lower(), []).append(e.entity_id)
        return d

    def entity_table(self):
        """entities as a pyarrow table (input to canonicalization)."""
        import pyarrow as pa

        return pa.table(
            {
                "entity_id": [e.entity_id for e in self.entities],
                "etype": [e.etype for e in self.entities],
                "canonical": [e.canonical for e in self.entities],
                "aliases": [list(e.aliases) for e in self.entities],
            }
        )


def _twin_variant(rng: random.Random, name: str) -> str:
    kind = rng.random()
    if kind < 0.4:
        return name + " Inc."
    if kind < 0.7:
        return name + " Incorporated"
    # typo variant: drop one interior character of the longest word
    words = name.split()
    w = max(words, key=len)
    i = rng.randrange(1, len(w) - 1)
    return name.replace(w, w[:i] + w[i + 1:], 1)


def build_world(seed: int = 42, n_people: int = 80, n_orgs: int = 24, n_places: int = 40) -> World:
    rng = random.Random(seed)
    entities: list[Entity] = []
    gold: dict[str, str] = {}

    def next_id(prefix: str) -> str:
        return f"{prefix}{len(entities):05d}"

    # people — unique full names; bare-surname / initials aliases only
    # when globally unique (keeps every surface unambiguous)
    fulls: list[tuple[str, str]] = []
    seen = set()
    while len(fulls) < n_people:
        pair = (rng.choice(FIRST_NAMES), rng.choice(LAST_NAMES))
        full = f"{pair[0]} {pair[1]}"
        if full not in seen:
            seen.add(full)
            fulls.append(pair)
    last_counts: dict[str, int] = {}
    for _, last in fulls:
        last_counts[last] = last_counts.get(last, 0) + 1
    for first, last in fulls:
        full = f"{first} {last}"
        aliases = [full]
        if last_counts[last] == 1:
            aliases.append(last)
            if rng.random() < 0.5:
                aliases.append(f"{first[0]}. {last}")
        eid = next_id("P")
        entities.append(Entity(eid, "person", full, tuple(aliases)))
        gold[eid] = eid

    # orgs — unique stems so the bare-stem alias is unambiguous; every
    # 4th org gets a near-duplicate twin record for canonicalization
    stems = list(ORG_STEMS)
    rng.shuffle(stems)
    org_names = [f"{stems[k]} {rng.choice(ORG_SUFFIXES)}" for k in range(n_orgs)]
    abbrevs = ["".join(w[0] for w in n.split()).upper() for n in org_names]
    abbrev_counts: dict[str, int] = {}
    for a in abbrevs:
        abbrev_counts[a] = abbrev_counts.get(a, 0) + 1
    for k, name in enumerate(org_names):
        aliases = [name, stems[k]]
        # abbreviation alias only when globally unique (no ambiguity)
        if len(abbrevs[k]) >= 2 and abbrev_counts[abbrevs[k]] == 1:
            aliases.append(abbrevs[k])
        eid = next_id("O")
        entities.append(Entity(eid, "org", name, tuple(aliases)))
        gold[eid] = eid
        if k % 4 == 0:
            twin_name = _twin_variant(rng, name)
            twin_id = next_id("O")
            entities.append(Entity(twin_id, "org", twin_name, (twin_name,)))
            gold[twin_id] = eid  # twin's cluster root is the original

    for name in (CITIES + COUNTRIES)[:n_places]:
        eid = next_id("L")
        entities.append(Entity(eid, "place", name, (name,)))
        gold[eid] = eid

    return World(seed=seed, entities=entities, gold_clusters=gold)


def zipf_choice(rng: random.Random, items: list, s: float = 1.1):
    """Zipf-skewed choice — creates hot entities (skewed shuffle keys)."""
    n = len(items)
    # inverse-CDF sampling over 1/rank^s without materializing weights
    # per call would be nicer; n is small so cumulative weights are fine
    weights = [1.0 / (r + 1) ** s for r in range(n)]
    return rng.choices(items, weights=weights, k=1)[0]


# Predicate templates: each instantiates one sentence carrying exactly one
# (subj, pred, obj) fact; the OpenIE stage recognizes the same verb
# patterns (and only validated entity arguments, for precision).
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
