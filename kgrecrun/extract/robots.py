"""robots.txt (RFC 9309) parsing + crawl-frontier politeness gate.

A polite crawler filters its frontier through each host's robots.txt
before fetching. ``parse_robots`` implements the RFC's group model
(user-agent lines open groups; the most specific matching product
token wins, ``*`` is the fallback), allow/disallow rules with ``*``
wildcards and the ``$`` end anchor, longest-match precedence with
allow winning ties, comments, unknown fields (crawl-delay etc.)
skipped, and the empty-disallow = allow-everything rule.

``robots_filter`` is the Ray stage: the robots table — ONE ROW PER
HOST, the classic bounded broadcast small side — is ``ray.put`` once;
each actor compiles every host's rule list and the per-pattern regexes
in ``__init__`` (once per actor, never per batch) and appends an
``allowed`` flag per frontier url. A url whose host has no robots row
is allowed (RFC: missing robots.txt means unrestricted), and an
unparseable url is allowed through — the politeness gate must never
silently eat a frontier entry.

Scale shape: stateless-after-init vectorized map over the frontier,
zero exchange; the broadcast is bytes-of-robots × hosts, asserted
small by the caller the same way broadcast_lookup documents its bound.
"""

from __future__ import annotations

import re

import pyarrow as pa

_URL_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)([^#]*)$")


def parse_robots(text: str, agent: str = "kgrecrun") -> list[tuple[bool, str]]:
    """robots.txt text → the rule list [(allow, pattern)] of the group
    that governs ``agent`` (most specific user-agent token; ``*``
    fallback; empty list = everything allowed)."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agent_run = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur_agents and not in_agent_run:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            in_agent_run = True
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if cur_agents:
                cur_rules.append((key == "allow", val))
        else:  # crawl-delay, sitemap, unknown fields: group content,
            in_agent_run = False  # but not rules we enforce
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    agent_l = agent.lower()
    best_rules: list[tuple[bool, str]] | None = None
    best_len = -1
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                spec = 0
            elif agent_l.startswith(a) or a in agent_l:
                spec = len(a)
            else:
                continue
            if spec > best_len:
                best_len = spec
                best_rules = rules
    return best_rules or []


class _Matcher:
    """Compiled rule list: longest-match precedence, allow wins ties,
    empty patterns never match (empty Disallow = allow everything)."""

    def __init__(self, rules: list[tuple[bool, str]]):
        self.compiled: list[tuple[bool, int, re.Pattern]] = []
        for allow, pattern in rules:
            if not pattern:
                continue
            anchored = pattern.endswith("$")
            body = pattern[:-1] if anchored else pattern
            rx = "^" + re.escape(body).replace(r"\*", ".*") \
                + ("$" if anchored else "")
            self.compiled.append((allow, len(pattern), re.compile(rx)))

    def allowed(self, path: str) -> bool:
        verdict = True
        best = -1
        for allow, plen, rx in self.compiled:
            if rx.match(path) is None:
                continue
            if plen > best:
                best, verdict = plen, allow
            elif plen == best and allow:
                verdict = True
        return verdict


def robots_allowed(path: str, rules: list[tuple[bool, str]]) -> bool:
    return _Matcher(rules).allowed(path)


def robots_filter(frontier, robots_table: pa.Table, *,
                  agent: str = "kgrecrun", url_col: str = "url"):
    """frontier Dataset + (host, robots_txt) table → frontier with an
    ``allowed`` int64 flag (1/0). Broadcast once, compile per actor."""
    import ray

    ref = ray.put(robots_table)

    class Gate:
        def __init__(self):
            tbl = ray.get(ref)
            self.matchers = {
                h: _Matcher(parse_robots(t, agent))
                for h, t in zip(tbl["host"].to_pylist(),
                                tbl["robots_txt"].to_pylist())
            }

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for u in batch[url_col].to_pylist():
                m = _URL_RE.match(u or "")
                if m is None:
                    out.append(1)  # never eat a frontier entry
                    continue
                matcher = self.matchers.get(m.group(1).lower())
                if matcher is None:
                    out.append(1)  # no robots.txt: unrestricted
                    continue
                out.append(int(matcher.allowed(m.group(2) or "/")))
            return batch.append_column("allowed", pa.array(out, pa.int64()))

    return frontier.map_batches(Gate, batch_format="pyarrow",
                                concurrency=(1, 8))


def frontier_schedule(frontier, *, per_host: int = 8,
                      url_col: str = "url", n_buckets: int = 64):
    """Politeness SCHEDULING of an (already robots-gated) fetch
    frontier: under the classic "at most ``per_host`` concurrent
    fetches per host per crawl round" budget, assign every url its
    per-host sequence number and the earliest round it may be fetched
    in — ``(url, host, rn, fetch_round)`` with ``rn`` the 1-based rank
    of the url within its host (ordered by url, deterministic) and
    ``fetch_round = (rn-1)//per_host + 1``. Downstream a crawler
    consumes rounds in order, which also yields the round-size
    histogram (max rounds = ceil(largest host / per_host), the crawl's
    politeness-bound makespan).

    Scale shape: ONE bucketed shuffle on hash(host); inside a bucket a
    single lexsort (host, url) + vectorized segment row-numbers rank
    every host in the bucket (the group_rank_windows sweep). The host
    key is coarser than doc-scale, so a bucket holds whole hosts —
    the per-group bound is pages-per-host × hosts-per-bucket, fine at
    web scale where a host is 10³–10⁷ pages but NOT for a synthetic
    single-host corpus (that degenerate case needs the distributed
    sort + range-prefix-offset path in ops/pack.py). Urls with no
    parseable host group under host='' rather than being dropped —
    the politeness scheduler, like the gate, never eats an entry.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..kg.unionfind import hash_bucket

    def host_rows(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].combine_chunks()
        host = pc.fill_null(pc.struct_field(pc.extract_regex(
            urls, r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]*)"), "host"), "")
        t = pa.table({"url": urls, "host": host})
        return t.append_column(
            "__bucket", hash_bucket(t["host"].combine_chunks(), n_buckets))

    def schedule_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            ("host", "ascending"), ("url", "ascending")])
        g = group.take(order)
        n = g.num_rows
        h = g["host"].combine_chunks()
        new_host = np.ones(n, dtype=bool)
        if n > 1:
            new_host[1:] = ~pc.equal(h.slice(1), h.slice(0, n - 1)) \
                .to_numpy(zero_copy_only=False).astype(bool)
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_host, idx, 0))
        rn = idx - seg_start + 1
        return pa.table({
            "url": g["url"],
            "host": h,
            "rn": pa.array(rn, pa.int64()),
            "fetch_round": pa.array((rn - 1) // per_host + 1, pa.int64()),
        })

    return (frontier.map_batches(host_rows, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(schedule_bucket, batch_format="pyarrow"))
