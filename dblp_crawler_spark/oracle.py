"""Single-process reference oracle — the canonical crawl contract.

A faithful reimplementation of the reference BFS
(/root/reference/dblp_crawler/graph.py:81-158, __main__.py:37-53)
over the fixture universe instead of HTTP, with the nondeterminism
removed. The engine must match this oracle EXACTLY (crawl order,
URL-seen set, summary), per BASELINE.json.

Canonical semantics (shared, engine mirrors each rule):

  * Merged fetch+expand wave. The reference fetches a person either
    in the retry phase (graph.py:89-99) or inside `_collect_authors`
    (graph.py:21-28) and expands them in the next loop over
    `persons` — but its emission/fetch interleaving is completion-
    order nondeterministic (gather.py:4-15). Canonically: a wave
    schedules pending pids, fetches them, EMITS pubs discovered in
    the previous wave (their authors' fetch was just attempted —
    mirroring the reference emitting a pub right after
    `_collect_authors` finishes), then EXPANDS this wave's fetched
    persons into new pubs + newly-discovered pending pids.
  * Crawler filter (graph.py:41,110; __main__.py:37-40):
    year >= Y (NULL year fails, as int(None) raises in the
    reference) AND CNF keyword match (keyword/__init__.py:24-32).
  * Seen-pub dedup before any work (graph.py:42-44,111-113).
  * Wave 0 journal init (graph.py:30-60, journal.py:21-38):
    venue index pages → refs + non-workshop proceedings with a url,
    '.html' stripped → volume pages → pubs → same filter/dedup.
  * Canonical order: within a wave, scheduled URLs sorted by
    (priority DESC, url ASC); wave 0 prepends journal-index urls
    (sorted) then volume urls (sorted, deduped). Emission order:
    pub key ASC.
  * Priority (engine functions/priority.py): ccf_weight<<48 |
    clamp(year)<<32 | (65536 - depth); a discovered pid takes the
    MAX over the pubs that discovered it this wave; CLI/pid seeds
    take SEED_PRIORITY. The reference's year/venue filters are the
    priority inputs (SURVEY.md T3).
  * Politeness: per wave, per host, at most `host_budget` person
    fetches, highest priority first; the rest stay pending. robots
    disallow-prefixes remove a url permanently (status
    'disallowed'). The reference's analog is one global semaphore
    (downloader.py:25-27) and no robots — these are north_rule
    upgrades, defined here, matched by the engine.
  * Retry: failed fetches stay pending and retry next wave
    (graph.py:89-99) up to `max_attempts`.
  * Emission (graph.py:139-152): authors_id = authors whose fetch
    has EVER succeeded; summarize_person on first emitted pub
    naming them; edges = sorted pairs (a<b) of authors_id per pub.
  * Termination (__main__.py:43-53): wave limit, or nothing
    scheduled and nothing pending emission.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .fixtures import SEED_PRIORITY, Universe, host_of_pid, person_url

_CCF_W = {"A": 3, "B": 2, "C": 1, "N": 0}
_TITLE_HASH_RE = re.compile(r"[^0-9a-z一-鿿ﬀ-﻿]")
_WORD_RE = re.compile(r"\w+")


def title_hash(title: str) -> str:
    return _TITLE_HASH_RE.sub("", title.lower()) or title.lower().replace(" ", "")


def keyword_match(title: str | None, rules: list[list[str]]) -> bool:
    if not rules:
        return True
    if title is None:
        return False
    words = set(_WORD_RE.findall(title.lower()))
    return any(set(w.lower() for w in rule) <= words for rule in rules)


def url2doi(url: str) -> str | None:
    from urllib.parse import urlparse

    p = urlparse(url)
    if p.netloc != "doi.org":
        return None
    return re.sub(r"^/+", "", p.path)


def priority_of(ccf: str, year: int | None, depth: int) -> int:
    y = min(max(year or 0, 0), 9999)
    return (_CCF_W.get(ccf, 0) << 48) | (y << 32) | max(0, (1 << 16) - depth)


def pub_ccf(pub: dict, ccf_rank: dict) -> str:
    jk = "/".join(pub["url"].split("/")[0:3]) if pub.get("url") else None
    return ccf_rank.get(jk, "N")


def pub_journal_key(pub: dict) -> str | None:
    return "/".join(pub["url"].split("/")[0:3]) if pub.get("url") else None


def crawler_filter(pub: dict, year: int, rules: list[list[str]]) -> bool:
    if pub["year"] is None or pub["year"] < year:
        return False
    return keyword_match(pub["title"], rules)


def output_match(pub: dict, year: int | None, rules: list[list[str]] | None) -> bool:
    """F2 output-filter (graph.py:68-72): emission-only pruning; the
    crawl still expands through non-matching pubs."""
    if year is not None and (pub["year"] is None or pub["year"] < year):
        return False
    if rules:
        return keyword_match(pub["title"], rules)
    return True


@dataclass
class OracleResult:
    crawl_order: list = field(default_factory=list)  # (wave, seq, url)
    seen_pubs: set = field(default_factory=set)
    frontier: dict = field(default_factory=dict)  # pid -> row dict
    nodes: dict = field(default_factory=dict)
    edges: set = field(default_factory=set)  # (src, dst, pub_key)
    publications: dict = field(default_factory=dict)
    metrics: list = field(default_factory=list)
    journal_init_counts: dict = field(default_factory=dict)  # A7
    waves: int = 0


def _robots_disallowed(url: str, host: str, robots: list[dict]) -> bool:
    for r in robots:
        if r["host"] == host:
            return any(url.startswith(p) for p in r["disallow_prefixes"] or [])
    return False


def run_oracle(
    u: Universe,
    year: int | None = None,
    rules: list[list[str]] | None = None,
    host_budget: int | None = None,
    wave_ms: int | None = None,
    max_attempts: int = 3,
    limit: int = -1,
    use_robots: bool = True,
    output_year: int | None = None,
    output_rules: list[list[str]] | None = None,
) -> OracleResult:
    year = u.year_filter if year is None else year
    rules = u.keyword_rules if rules is None else rules
    res = OracleResult()
    frontier = res.frontier
    pending_emission: list[str] = []  # pub keys discovered last wave
    seq = 0

    def add_pid(pid: str, depth: int, priority: int) -> None:
        if pid in frontier:
            return
        url = person_url(pid)
        host = host_of_pid(pid)
        status = "pending"
        if use_robots and _robots_disallowed(url, host, u.robots):
            status = "disallowed"
        frontier[pid] = {
            "pid": pid, "url": url, "host": host, "status": status,
            "depth": depth, "priority": priority, "attempts": 0,
        }

    for pid in u.seeds_pids:
        add_pid(pid, 0, SEED_PRIORITY)

    wave = 0
    while limit < 0 or wave < limit:
        m = {"wave": wave, "scheduled": 0, "fetch_succ": 0, "fetch_fail": 0,
             "pubs_new": 0, "authors_new": 0, "remain_pending": 0, "emitted": 0}

        # ---- wave-0 journal init (graph.py:30-60) ------------------------
        journal_pubs: list[dict] = []
        if wave == 0 and u.seeds_journals:
            index_urls = sorted(f"{jk}/index" for jk in u.seeds_journals)
            vol_urls: set[str] = set()
            for iu in index_urls:
                res.crawl_order.append((wave, seq, iu))
                seq += 1
                jl = u.journal_lists.get(iu)
                if jl is None:
                    continue
                urls = [re.sub(r"\.html$", "", r) for r in jl["refs"]]
                for proc in jl["proceedings"]:
                    if proc["booktitle"] is not None and proc["booktitle"].lower() not in jl["h1"].lower():
                        continue  # skip workshops (journal.py:33-34)
                    if proc["url"] is None:
                        continue  # skip not-in-dblp (journal.py:35-36)
                    urls.append(re.sub(r"\.html$", "", proc["url"]))
                vol_urls.update(urls)
            for vu in sorted(vol_urls):
                res.crawl_order.append((wave, seq, vu))
                seq += 1
                vol = u.journals.get(vu)
                if vol is None:
                    continue
                for pub in vol["pubs"]:
                    if not crawler_filter(pub, year, rules):
                        continue
                    if pub["key"] in res.seen_pubs:
                        continue
                    res.seen_pubs.add(pub["key"])
                    journal_pubs.append(pub)
            # A7 (graph.py:46-58): init batch counts per journal
            for p in journal_pubs:
                jk = pub_journal_key(p)
                res.journal_init_counts[jk] = res.journal_init_counts.get(jk, 0) + 1

        # ---- schedule person fetches (T3 + O5) ---------------------------
        candidates = [r for r in frontier.values() if r["status"] == "pending" and r["attempts"] < max_attempts]
        candidates.sort(key=lambda r: (-r["priority"], r["url"]))
        # per-host budget: tighter of the global budget and the
        # robots-crawl-delay-derived slot count (engine mirror:
        # operators/scheduler.politeness_pop + plans/crawl.py)
        delay_budget: dict[str, int] = {}
        if wave_ms:
            for rb in u.robots:
                d = rb.get("crawl_delay_ms")
                if d:
                    # ≥1 slot/wave: a delay longer than the wave
                    # window throttles but never starves the host
                    # (zero slots would leave its URLs pending
                    # forever and break termination). Engine mirror:
                    # plans/crawl.py host_budgets.
                    delay_budget[rb["host"]] = max(1, wave_ms // d)
        scheduled = []
        host_counts: dict[str, int] = {}
        for r in candidates:
            c = host_counts.get(r["host"], 0)
            limits = [b for b in (host_budget, delay_budget.get(r["host"])) if b is not None]
            if limits and c >= min(limits):
                continue  # stays pending for a later wave
            host_counts[r["host"]] = c + 1
            scheduled.append(r)
        for r in scheduled:
            res.crawl_order.append((wave, seq, r["url"]))
            seq += 1

        # ---- fetch (downloader.py:52-84, simulated) -----------------------
        fetched_pids = []
        for r in scheduled:
            r["attempts"] += 1
            if r["pid"] in u.missing_pids:
                r["status"] = "pending" if r["attempts"] < max_attempts else "failed"
                m["fetch_fail"] += 1
            else:
                r["status"] = "fetched"
                m["fetch_succ"] += 1
                fetched_pids.append(r["pid"])
        m["scheduled"] = len(scheduled)

        # ---- emit pubs discovered last wave (graph.py:139-152) -----------
        def fetch_succeeded(pid: str) -> bool:
            return pid in frontier and frontier[pid]["status"] in ("fetched", "expanded")

        for key in sorted(pending_emission):
            pub = u.pubs[key]
            if not output_match(pub, output_year, output_rules):
                continue  # F2: crawled but never emitted
            authors_id = sorted({a["pid"] for a in pub["authors"] if fetch_succeeded(a["pid"])})
            for a in authors_id:
                if a not in res.nodes:
                    p = u.persons[a]
                    res.nodes[a] = {
                        "pid": a, "name": p["name"], "affiliations": list(p["affiliations"]),
                        "pub_keys": [pp["key"] for pp in p["pubs"]],
                    }
            for i in range(len(authors_id)):
                for j in range(i + 1, len(authors_id)):
                    res.edges.add((authors_id[i], authors_id[j], key))
            res.publications[key] = _pub_record(pub, u, selected=True)
            m["emitted"] += 1

        # ---- expand this wave's fetched persons (graph.py:101-118) -------
        new_pubs = list(journal_pubs)
        for pid in sorted(fetched_pids):
            frontier[pid]["status"] = "expanded"
            for pub in u.persons[pid]["pubs"]:
                if not crawler_filter(pub, year, rules):
                    continue
                if pub["key"] in res.seen_pubs:
                    continue
                res.seen_pubs.add(pub["key"])
                new_pubs.append(pub)
        m["pubs_new"] = len(new_pubs)

        # ---- discover authors of new pubs (graph.py:21-28) ---------------
        journal_keys_set = {p["key"] for p in journal_pubs}
        disc: dict[str, int] = {}
        for pub in new_pubs:
            # depth of discoverer: journal pubs discover at depth 0
            if pub["key"] in journal_keys_set:
                base_depth = 0
            else:
                base_depth = frontier[_discoverer_pid(pub, frontier)]["depth"] + 1
            prio = priority_of(pub_ccf(pub, u.ccf_rank), pub["year"], base_depth)
            for a in pub["authors"]:
                if a["pid"] in frontier:
                    continue
                cur = disc.get(a["pid"])
                # max priority wins; tie → min depth (deterministic)
                if cur is None or (prio, -base_depth) > (cur[0], -cur[1]):
                    disc[a["pid"]] = (prio, base_depth)
        for pid, (prio, depth) in disc.items():
            add_pid(pid, depth, prio)
        m["authors_new"] = len(disc)

        pending_emission = sorted(p["key"] for p in new_pubs)
        m["remain_pending"] = sum(1 for r in frontier.values() if r["status"] == "pending" and r["attempts"] < max_attempts)
        res.metrics.append(m)
        wave += 1
        res.waves = wave
        if m["remain_pending"] == 0 and not pending_emission:
            break
    # non-selected pubs: every pub on every summarized person's page
    # (dict_summary's update(pub) over person.publications(),
    # summarizer/networkx.py:84-86)
    for nid in res.nodes:
        for pub in u.persons[nid]["pubs"]:
            if pub["key"] not in res.publications:
                res.publications[pub["key"]] = _pub_record(pub, u, selected=False)
    return res


def dict_summary(res: "OracleResult", u: Universe) -> dict:
    """Reference dict_summary (summarizer/networkx.py:66-96) over the
    oracle result, with canonical (sorted) list orders: only
    edge-incident persons are nodes; a node's publications are its
    incident-edge pubs; edge cooperation = full page pub-key
    intersection; publications = edge pubs (selected) ∪ node page
    pubs."""
    import json as _json

    incident: dict[str, set] = {}
    pair_pubs: dict[tuple, set] = {}
    for a, b, k in res.edges:
        incident.setdefault(a, set()).add(k)
        incident.setdefault(b, set()).add(k)
        pair_pubs.setdefault((a, b), set()).add(k)
    nodes = {}
    for pid in incident:
        n = res.nodes[pid]
        nodes[pid] = {
            "id": pid,
            "label": n["name"],
            "person": {
                "dblp_pid": pid,
                "name": n["name"],
                "affiliations": list(n["affiliations"]),
                "publications": list(n["pub_keys"]),
            },
            "publications": sorted(incident[pid]),
        }
    edges = {}
    for (a, b), ks in pair_pubs.items():
        pa, pb = set(res.nodes[a]["pub_keys"]), set(res.nodes[b]["pub_keys"])
        edges[_json.dumps({"from": a, "to": b})] = {
            "from": a,
            "to": b,
            "publications": sorted(ks),
            "cooperation": sorted(pa & pb),
        }
    edge_keys = {k for ks in pair_pubs.values() for k in ks}
    pubs = {}

    def emit_pub(key: str, selected: bool) -> None:
        rec = _pub_record(u.pubs[key], u, selected)
        d = {
            "dblp_key": key,
            "title": rec["title"],
            "title_hash": rec["title_hash"],
            "journal": rec["journal"],
            "journal_key": rec["journal_key"],
            "year": rec["year"],
            "mdate": rec["mdate"],
            "doi": rec["doi"],
            "ccf": rec["ccf"],
            "authors": {a["pid"]: {"dblp_pid": a["pid"], "name": a["name"], "orcid": a["orcid"]} for a in rec["authors"]},
        }
        if selected:
            d["selected"] = True
        pubs[key] = d

    for k in edge_keys:
        emit_pub(k, True)
    for pid in incident:
        for k in res.nodes[pid]["pub_keys"]:
            if k not in pubs:
                emit_pub(k, False)
    return {"nodes": nodes, "edges": edges, "publications": pubs}


def _discoverer_pid(pub: dict, frontier: dict) -> str:
    """Canonical discoverer of a person-expanded pub: the minimum pid
    among this wave's expanded authors of the pub. (Any author
    expanded in an earlier wave would already have put the pub in the
    seen set, so every 'expanded' author of a new pub was expanded
    this wave; min-pid matches the sorted expansion order.)"""
    cands = [
        a["pid"]
        for a in pub["authors"]
        if a["pid"] in frontier and frontier[a["pid"]]["status"] == "expanded"
    ]
    return min(cands)


def _pub_record(pub: dict, u: Universe, selected: bool) -> dict:
    dois = [d for d in (url2doi(e) for e in pub["ee"] or []) if d is not None]
    return {
        "key": pub["key"],
        "title": pub["title"],
        "title_hash": title_hash(pub["title"]) if pub["title"] is not None else None,
        "journal": pub["journal"],
        "journal_key": pub_journal_key(pub),
        "year": pub["year"],
        "mdate": pub["mdate"],
        "doi": dois[0] if dois else None,
        "ccf": pub_ccf(pub, u.ccf_rank),
        "authors": pub["authors"],
        "selected": selected,
        "image_id": pub.get("image_id"),
    }
